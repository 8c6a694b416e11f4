"""Profiling / tracing aids.

The reference's observability is wall-clock stage accounting logged every 20
frames (reference piclassifier.py:117-127, 1059-1085) plus tracking_time in
output metadata. We keep those and add the JAX profiler: set
CPTPU_PROFILE_DIR to capture a TensorBoard-compatible device trace around
any StageTimer block.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict


class StageTimer:
    """Accumulates per-stage wall time; render as percentage breakdown."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        total = sum(self.totals.values()) or 1e-9
        return {
            name: {
                "seconds": round(t, 4),
                "percent": round(100 * t / total, 1),
                "calls": self.counts[name],
            }
            for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def log(self, prefix=""):
        logging.info("%stiming: %s", prefix, self.summary())


@contextlib.contextmanager
def device_trace(name="trace"):
    """JAX profiler capture when CPTPU_PROFILE_DIR is set; no-op otherwise."""
    profile_dir = os.environ.get("CPTPU_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield
    logging.info("wrote device trace %r to %s", name, profile_dir)
