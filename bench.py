"""Benchmark: end-to-end extract+classify throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the driver's north star is >50x real-time end-to-end processing of
a Lepton3/3.5 clip per chip = 450 frames/s (clips are 9 fps). The reference's
own CI bound is 40 ms/frame (25 fps) tracking-only.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_FPS = 450.0  # 50x real-time at 9 fps
CLIP = Path("/root/reference/tests/clips/possum.cptv")


def main():
    t_setup = time.time()
    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.models.artifacts import create_model
    from classifier_pipeline_tpu.config.config import Config, ModelConfig
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier

    import tempfile

    tmp = tempfile.mkdtemp()
    model_prefix = Path(tmp) / "bench-model"
    create_model(model_prefix)
    model = ModelConfig(id=1, name="bench", model_file=str(model_prefix) + ".json")
    classifier = ClipClassifier(Config({}), model=model, seed=42)

    clip = load_cptv(CLIP)
    n_frames = int((~clip.is_background).sum())

    # warm-up (compilation)
    classifier.process_file(CLIP)
    # timed runs
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        classifier.process_file(CLIP)
        best = min(best, time.time() - t0)
    fps = n_frames / best
    print(
        json.dumps(
            {
                "metric": "end_to_end_extract_classify_fps",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
