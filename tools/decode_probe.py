"""Interleaved A/B probe: native CPTV decode with output memcpy (the old
cptv_read_all/read_delta path) vs zero-copy pointer views.

Host-only (no device). Run: python tools/decode_probe.py [n_rounds]
"""

import ctypes
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from classifier_pipeline_tpu.cptv import codec

CLIPS = [
    Path("/root/reference/tests/clips/possum.cptv"),
    Path("/root/reference/tests/clips/hedgehog.cptv"),
]


def decode_copy(lib, path):
    """The pre-zero-copy path: read_all + read_delta into fresh numpy."""
    h = lib.cptv_open_file(str(path).encode())
    try:
        n = lib.cptv_num_frames(h)
        W, H = lib.cptv_width(h), lib.cptv_height(h)
        pixels = np.empty((n, H, W), np.uint16)
        meta = np.empty((n, 5), np.uint32)
        lib.cptv_read_all(h, pixels.ctypes.data_as(ctypes.c_void_p),
                          meta.ctypes.data_as(ctypes.c_void_p))
        n_exc = lib.cptv_num_exceptions(h)
        resid = np.empty((n - 1, H, W), np.int8)
        shift = np.empty(n - 1, np.int32)
        exc_idx = np.empty(max(int(n_exc), 1), np.int32)
        exc_val = np.empty(max(int(n_exc), 1), np.int32)
        lib.cptv_read_delta(
            h, resid.ctypes.data_as(ctypes.c_void_p),
            shift.ctypes.data_as(ctypes.c_void_p),
            exc_idx.ctypes.data_as(ctypes.c_void_p),
            exc_val.ctypes.data_as(ctypes.c_void_p), int(n_exc))
        return pixels, meta, resid
    finally:
        lib.cptv_close(h)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    lib = codec._load_native()
    assert lib is not None and hasattr(lib, "cptv_pixels_ptr")
    raws = [p.read_bytes() for p in CLIPS]  # warm page cache
    del raws
    for p in CLIPS:
        codec.load_cptv(p)  # warm
    t_copy = t_zero = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for p in CLIPS:
            decode_copy(lib, p)
        t_copy += time.perf_counter() - t0
        t0 = time.perf_counter()
        for p in CLIPS:
            codec.load_cptv(p)
        t_zero += time.perf_counter() - t0
    n = rounds * len(CLIPS)
    print(f"copy path:      {1e3 * t_copy / n:.2f} ms/clip")
    print(f"zero-copy path: {1e3 * t_zero / n:.2f} ms/clip "
          f"({100 * (1 - t_zero / t_copy):.0f}% faster)")


if __name__ == "__main__":
    main()
