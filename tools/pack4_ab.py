"""Interleaved A/B of the 4-bit residual upload (CPTPU_DELTA_PACK4) on the
real TPU. Alternates within one session so tunnel drift can't confound the
comparison. Run under a watchdog:

    timeout 1500 python tools/pack4_ab.py --rounds 3
"""

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(Path(__file__).parents[1] / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from classifier_pipeline_tpu.config.config import Config, ModelConfig
    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.models.artifacts import create_model
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier

    tmp = tempfile.mkdtemp()
    prefix = Path(tmp) / "m"
    create_model(prefix)
    model = ModelConfig(id=1, name="ab", model_file=str(prefix) + ".json")
    clf = ClipClassifier(Config({}), model=model, seed=42)
    clips = Path("/root/reference/tests/clips")
    paths = [clips / "possum.cptv", clips / "hedgehog.cptv"] * (args.batch // 2)
    n_frames = sum(int((~load_cptv(p).is_background).sum()) for p in paths)

    settings = ["0", "1"]
    for s in settings:  # warm both compiled programs
        os.environ["CPTPU_DELTA_PACK4"] = s
        clf.process_batch(paths)
    times = {s: [] for s in settings}
    for r in range(args.rounds):
        for s in settings:
            os.environ["CPTPU_DELTA_PACK4"] = s
            t0 = time.time()
            clf.process_batch(paths)
            dt = time.time() - t0
            times[s].append(dt)
            print(
                f"round {r} pack4={s}: {dt:.2f}s ({n_frames / dt:.0f} fps)",
                file=sys.stderr,
                flush=True,
            )
    print(
        json.dumps(
            {
                ("pack4" if s == "1" else "int8"): {
                    "median_s": round(statistics.median(ts), 2),
                    "best_fps": round(n_frames / min(ts), 1),
                    "median_fps": round(n_frames / statistics.median(ts), 1),
                }
                for s, ts in times.items()
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
