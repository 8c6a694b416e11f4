"""Interleaved A/B of BATCH_PIPELINE_CHUNKS on the real TPU.

The tunnel's phase drifts minute-to-minute, so back-to-back whole-bench
comparisons confound chunk count with tunnel mood. This probe alternates
the two settings within ONE session (A B A B ...) and reports per-setting
medians. Run it under a watchdog (see bench.py's outer) — a wedged tunnel
client blocks forever with no error:

    timeout 1200 python tools/chunks_ab.py 4 8 --rounds 3
"""

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("chunks", nargs="+", type=int)
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

    # warm every setting once (compile shapes differ per chunk count)
    for c in args.chunks:
        clf.process_batch(paths, chunks=c)
    times = {c: [] for c in args.chunks}
    for r in range(args.rounds):
        for c in args.chunks:
            t0 = time.time()
            clf.process_batch(paths, chunks=c)
            dt = time.time() - t0
            times[c].append(dt)
            print(
                f"round {r} chunks={c}: {dt:.2f}s ({n_frames / dt:.0f} fps)",
                file=sys.stderr,
                flush=True,
            )
    print(
        json.dumps(
            {
                str(c): {
                    "median_s": round(statistics.median(ts), 2),
                    "best_fps": round(n_frames / min(ts), 1),
                    "median_fps": round(n_frames / statistics.median(ts), 1),
                }
                for c, ts in times.items()
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
