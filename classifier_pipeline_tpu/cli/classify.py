"""classify CLI (reference src/classify.py + src/classify/main.py)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from classifier_pipeline_tpu.config.config import Config, ModelConfig
from classifier_pipeline_tpu.utils.logs import init_logging
from classifier_pipeline_tpu.utils.tools import enable_compile_cache


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native clip classification")
    parser.add_argument("target", help="a CPTV file or directory")
    parser.add_argument("-c", "--config-file")
    parser.add_argument("-m", "--model-file", help="override model path")
    parser.add_argument("-o", "--out-dir", help="output dir for metadata")
    parser.add_argument("--to-stdout", action="store_true")
    parser.add_argument("--seed", type=int, help="deterministic segment sampling")
    parser.add_argument(
        "--no-track", dest="track", action="store_false",
        help="reuse tracks from the existing .txt metadata instead of re-tracking",
    )
    parser.add_argument(
        "--batch", action="store_true",
        help="track+classify all files concurrently on one chip",
    )
    parser.add_argument("--platform", choices=["tpu", "cpu", "default"], default="default")
    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    init_logging()
    enable_compile_cache()
    config = Config.load_from_file(args.config_file)

    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier

    model = None
    if args.model_file:
        model = ModelConfig(id=0, name="cli-model", model_file=args.model_file)
    classifier = ClipClassifier(config, model=model, seed=args.seed)

    target = Path(args.target)
    files = sorted(target.rglob("*.cptv")) if target.is_dir() else [target]

    def emit(f, meta):
        if args.to_stdout:
            from classifier_pipeline_tpu.pipeline.extractor import _json_default

            print(json.dumps(meta, default=_json_default))
        else:
            out = (
                Path(args.out_dir) / (f.stem + ".txt")
                if args.out_dir
                else f.with_suffix(".txt")
            )
            out.parent.mkdir(parents=True, exist_ok=True)
            classifier.save_metadata(meta, out)

    if args.batch and args.track and len(files) > 1:
        metas = classifier.process_batch(files)
        for f, meta in zip(files, metas):
            emit(f, meta)
    else:
        for f in files:
            if args.track:
                meta = classifier.process_file(f)
            else:
                meta = classifier.process_file_from_metadata(f)
            emit(f, meta)
    return 0


if __name__ == "__main__":
    sys.exit(main())
