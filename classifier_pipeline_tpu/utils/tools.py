"""Small shared utilities (reference src/ml_tools/tools.py)."""

from __future__ import annotations

import datetime
import json
from pathlib import Path

import numpy as np

_ndimage = None


def get_ndimage():
    """Deferred scipy.ndimage, cached: keeps scipy off the CLI startup path,
    and avoids re-resolving it per call — ``from scipy import ndimage``
    inside a hot function costs ~14 ms/call through scipy's lazy-submodule
    __getattr__ (measured in the streaming replay profile)."""
    global _ndimage
    if _ndimage is None:
        import scipy.ndimage

        _ndimage = scipy.ndimage
    return _ndimage


def enable_compile_cache(path=None):
    """Point jax at a persistent compilation cache so CLI runs skip the
    one-time jit compiles (the streaming step alone costs ~10s to compile
    on a Pi-class core; a remote-TPU Mosaic compile can cost minutes).
    Override the location with CPTPU_JAX_CACHE; disable with
    CPTPU_JAX_CACHE=0."""
    import os

    import jax

    path = path or os.environ.get("CPTPU_JAX_CACHE")
    if path == "0":
        return
    if not path:
        path = os.path.expanduser("~/.cache/classifier-pipeline-tpu/jax")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # CPU executables report size <= 0; the default 0-byte floor rejects them
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def eucl_distance_sq(first, second):
    x = first[0] - second[0]
    y = first[1] - second[1]
    return x * x + y * y


def calculate_variance(filtered, prev_filtered):
    if prev_filtered is None:
        return np.var(filtered)
    return np.var(filtered - prev_filtered)


class CustomJSONEncoder(json.JSONEncoder):
    """reference tools.CustomJSONEncoder: numpy + datetime + Path safe."""

    def default(self, obj):
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, (datetime.datetime, datetime.date, datetime.time)):
            return obj.isoformat()
        if isinstance(obj, datetime.timedelta):
            return obj.total_seconds()
        if isinstance(obj, Path):
            return str(obj)
        if hasattr(obj, "meta_dict"):
            return obj.meta_dict()
        if hasattr(obj, "name") and hasattr(obj, "value"):  # enums
            return obj.name
        return super().default(obj)


def frame_to_jpg(frame, out_path, t_min=None, t_max=None):
    """Save a thermal frame as a heat-mapped image."""
    from PIL import Image

    from classifier_pipeline_tpu.io.previewer import render_thermal

    rgb = render_thermal(np.asarray(frame), t_min, t_max, scale=1)
    Image.fromarray(rgb).save(out_path)
    return out_path


def get_timezone_str(lat, lng):
    """Rough timezone from longitude (reference uses timezonefinder; NZ
    deployments resolve to Pacific/Auckland)."""
    if 166 <= lng <= 179 and -48 <= lat <= -34:
        return "Pacific/Auckland"
    return "UTC"


def normalize_host(data, new_max=255.0):
    """Host-side reference imageprocessing.normalize (:151-169): min/max ->
    0..new_max; returns (f32 array, success). Shared by dbtool image export,
    the IR writer and previews — keep the flat-input edge case in one place."""
    import numpy as np

    mx, mn = float(data.max()), float(data.min())
    if mx == mn:
        if mx == 0:
            return np.zeros(data.shape, np.float32), False
        return data.astype(np.float32) / mx, False
    return new_max * (data.astype(np.float32) - mn) / (mx - mn), True
