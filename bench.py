"""Benchmark: end-to-end extract+classify throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the driver's north star is >50x real-time end-to-end processing of
Lepton thermal clips per chip = 450 frames/s (clips are 9 fps). The
reference's own CI bound is 40 ms/frame (25 fps) tracking-only.

The production shape is fleet batch processing, so the bench tracks a batch
of clips concurrently through the vmapped whole-clip scan (one chip), then
classifies every track, and reports aggregate end-to-end frames/sec.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

BASELINE_FPS = 450.0  # 50x real-time at 9 fps
CLIPS_DIR = Path("/root/reference/tests/clips")
BATCH = 8


def main():
    from classifier_pipeline_tpu.classify.interpreter import (
        ClipContext,
        FlaxInterpreter,
    )
    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.models.artifacts import create_model
    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor

    tmp = tempfile.mkdtemp()
    model_prefix = Path(tmp) / "bench-model"
    create_model(model_prefix)
    interpreter = FlaxInterpreter(str(model_prefix) + ".json")
    interpreter.seed = 42

    paths = [CLIPS_DIR / "possum.cptv", CLIPS_DIR / "hedgehog.cptv"] * (BATCH // 2)
    n_frames = sum(
        int((~load_cptv(p).is_background).sum()) for p in paths
    )

    def run_once():
        ex = ClipTrackExtractor(keep_rows=True, emit_filtered=True)
        results = ex.extract_batch(paths)
        for res in results:
            thermal = res.clip.pixels[~res.clip.is_background]
            filtered = np.asarray(res.rows.filtered)
            t = res.clip.time_on_ms[~res.clip.is_background].astype(np.int64)
            c = res.clip.last_ffc_ms[~res.clip.is_background].astype(np.int64)
            ctx = ClipContext(thermal, filtered, list(np.nonzero((t - c) < 9)[0]))
            for track in res.tracks:
                interpreter.classify_track(ctx, track, min_segments=1)
        return results

    run_once()  # warm-up / compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_once()
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
