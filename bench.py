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
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

BASELINE_FPS = 450.0  # 50x real-time at 9 fps
CLIPS_DIR = Path("/root/reference/tests/clips")
# 128 measured best in-session vs 64/256 (1449 vs 937 fps same tunnel
# session; 256 compiles longer and degrades run-to-run). Larger batches
# amortize the per-chunk tunnel latency without outgrowing HBM residency.
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
# The remote-TPU tunnel occasionally drops mid-session; a wedged client
# blocks forever (no error surfaces). The outer process runs the real bench
# as a watchdogged subprocess and retries on hang/failure with a fresh
# client so one flap can't zero the score.
INNER_TIMEOUT_S = int(os.environ.get("BENCH_INNER_TIMEOUT_S", "1500"))
RETRIES = int(os.environ.get("BENCH_RETRIES", "2"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _is_result(line):
    # a SIGKILLed child can leave a truncated line in the pipe; only a
    # complete JSON object counts as a salvageable result
    if not line.startswith("{"):
        return False
    try:
        return "metric" in json.loads(line)
    except ValueError:
        return False


def _tunnel_up(timeout_s):
    """Quick probe: can we run one tiny op on the device? A wedged/down
    tunnel hangs silently, so this runs in a short-timeout subprocess.
    The probe inherits the persistent compile cache so a healthy-but-slow
    remote compile service isn't mistaken for a dead tunnel."""
    code = (
        "import jax;"
        f"jax.config.update('jax_compilation_cache_dir',"
        f" {str(Path(__file__).parent / '.jax_cache')!r});"
        "import jax.numpy as jnp;"
        "x = jnp.ones((8, 8)); print(float((x @ x).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=timeout_s,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def outer():
    # The relay tunnel to the TPU occasionally drops for many minutes. A
    # cheap preflight avoids burning a full INNER_TIMEOUT on a silent hang
    # and waits (bounded) for the tunnel to come back before measuring.
    # First probe gets extra headroom for cold device/compile init.
    for wait in range(10):
        if _tunnel_up(timeout_s=240 if wait == 0 else 75):
            break
        log(f"bench: device tunnel down (probe {wait}); retrying in 120s")
        if wait < 9:
            time.sleep(120)
    for attempt in range(1 + RETRIES):
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--inner"],
                stdout=subprocess.PIPE,
                timeout=INNER_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired as exc:
            # the wedge can hit during client teardown AFTER the result
            # printed — salvage a complete measurement from partial stdout
            partial = (exc.stdout or b"").decode(errors="replace")
            lines = [l for l in partial.splitlines() if _is_result(l)]
            if lines:
                log("bench: inner hung at teardown but had printed a result")
                print(lines[-1])
                return 0
            log(f"bench: attempt {attempt} hung >{INNER_TIMEOUT_S}s "
                "(tunnel flap?), retrying with a fresh client")
            continue
        lines = [
            l for l in out.stdout.decode().splitlines()
            if _is_result(l)
        ]
        if out.returncode == 0 and lines:
            print(lines[-1])
            return 0
        log(f"bench: attempt {attempt} failed rc={out.returncode}, retrying")
    log("bench: all attempts failed")
    return 1


def main():
    import logging

    if os.environ.get("CPTPU_TIMING") == "1":
        # surface the StageTimer shares (logged at INFO) on stderr
        logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    import jax

    # persistent compile cache: repeat bench runs skip the one-time Mosaic
    # compiles (first cold run can take a few minutes on the remote service)
    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from classifier_pipeline_tpu.config.config import Config, ModelConfig
    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.models.artifacts import create_model
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier

    tmp = tempfile.mkdtemp()
    model_prefix = Path(tmp) / "bench-model"
    create_model(model_prefix)
    model = ModelConfig(id=1, name="bench", model_file=str(model_prefix) + ".json")
    classifier = ClipClassifier(Config({}), model=model, seed=42)

    paths = [CLIPS_DIR / "possum.cptv", CLIPS_DIR / "hedgehog.cptv"] * (BATCH // 2)
    n_frames = sum(
        int((~load_cptv(p).is_background).sum()) for p in paths
    )

    def run_once():
        return classifier.process_batch(paths)

    log(f"bench: warm-up (compile) over {len(paths)} clips, {n_frames} frames")
    t0 = time.time()
    run_once()  # warm-up / compile
    log(f"bench: warm-up took {time.time() - t0:.1f}s; timing 3 runs")
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        run_once()
        dt = time.time() - t0
        log(f"bench: run {i} {dt:.1f}s ({n_frames / dt:.1f} fps)")
        best = min(best, dt)
    fps = n_frames / best
    print(
        json.dumps(
            {
                "metric": "end_to_end_extract_classify_fps",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        ),
        # unflushed, the result can die in the pipe buffer if the tunnel
        # wedges the client during teardown (outer() then retries a
        # completed measurement)
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main() if "--inner" in sys.argv else outer())
