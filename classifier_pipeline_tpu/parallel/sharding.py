"""Device-mesh sharding for training and batch inference.

The reference is single-node Python (its only parallelism is process pools —
reference src/track/trackextractor.py:80-85, src/ml_tools/tfwriter.py:81-110).
The TPU-native equivalents:

  * data parallelism: batch axis sharded over the 'data' mesh axis — covers
    fleet-scale clip extraction and training batches.
  * tensor parallelism: wide conv/dense feature dims sharded over 'model' —
    the models are small, so this mainly demonstrates/exercises the path and
    keeps per-chip activation memory flat for very large batches.

XLA inserts the collectives (psum for grad reduction rides ICI).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def param_spec(path: str, value) -> P:
    """Shard conv/dense kernels on their output-feature (last) dim over
    'model'; replicate everything else (BN stats, biases, small params)."""
    if value.ndim >= 2 and value.shape[-1] % 2 == 0 and (
        "kernel" in path or "embedding" in path
    ):
        return P(*([None] * (value.ndim - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path_value):
        path, value = path_value
        name = "/".join(str(p) for p in path)
        return NamedSharding(mesh, param_spec(name, value))

    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = [
        "/".join(str(k) for k in p) for p, _ in flat
    ]
    shardings = [
        NamedSharding(mesh, param_spec(path, leaf))
        for path, leaf in zip(paths, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_device_group(group, mesh: Mesh):
    """Reshard a scan group's device arrays over the mesh's 'data' axis so
    the fused classification jit runs SPMD: each chip holds its shard of the
    clip batch; XLA inserts the (tiny) collectives for jobs whose lane lives
    on another chip. Returns a new DeviceGroup; the original is untouched.

    This is the multi-chip classification story matching the sharded scan
    (track_clips_batch_sharded): clips are data-parallel end to end."""
    import jax.numpy as jnp

    from classifier_pipeline_tpu.track.tracker_jax import DeviceGroup

    n_data = mesh.devices.shape[0]
    B = int(group.thermal.shape[0])
    pad = (-B) % n_data  # lane axis must divide the data axis; padding
    # lanes are never referenced by any job's lane index

    def padded(a, axis):
        if pad == 0:
            return a
        shape = list(a.shape)
        shape[axis] = pad
        return jnp.concatenate([a, jnp.zeros(shape, a.dtype)], axis=axis)

    th = jax.device_put(
        padded(group.thermal, 0), NamedSharding(mesh, P("data", None, None, None))
    )
    fil = jax.device_put(
        padded(group.filtered, 1), NamedSharding(mesh, P(None, "data", None, None))
    )
    med = (
        None
        if group.medians is None
        else jax.device_put(
            padded(group.medians, 0), NamedSharding(mesh, P("data", None))
        )
    )
    return DeviceGroup(th, fil, med)


def track_clips_batch_sharded(thermals, ffcs, params, mesh,
                              backgrounds=None, bucket=32):
    """Fleet-scale batch extraction: shard a clip batch over the mesh's
    'data' axis and run the whole-clip tracking scan SPMD.

    The TPU-native replacement for the reference's multiprocessing.Pool over
    files (reference src/track/trackextractor.py:80-85) at multi-chip scale:
    clips are independent, so XLA partitions the vmapped scan along the batch
    axis with no inter-chip collectives in the hot loop (the CCL while_loop's
    global convergence test is the only cross-chip reduction). Returns
    per-clip (rows, carry) like tracker_jax.track_clips_batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from classifier_pipeline_tpu.track import tracker_jax

    n_data = mesh.devices.shape[0]
    n_real = len(thermals)
    pad_clips = (-n_real) % n_data
    if pad_clips:
        thermals = list(thermals) + [thermals[-1]] * pad_clips
        ffcs = list(ffcs) + [ffcs[-1]] * pad_clips
        if backgrounds is not None:
            backgrounds = list(backgrounds) + [backgrounds[-1]] * pad_clips

    th, ffc_pad, carry0 = tracker_jax._pad_clip_batch(
        thermals, ffcs, params, backgrounds, bucket
    )

    data_first = lambda a: NamedSharding(
        mesh, P(*(("data",) + (None,) * (a.ndim - 1)))
    )
    th_dev = jax.device_put(th, data_first(th))
    ffc_dev = jax.device_put(ffc_pad, data_first(ffc_pad))
    carry0 = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, data_first(a)), carry0
    )
    with mesh:
        carry, rows = tracker_jax._track_scan_batch(
            params, carry0, th_dev, ffc_dev
        )
    rows = tracker_jax.fetch_rows(rows)
    backgrounds_np = np.asarray(carry.background)
    out = []
    for i in range(n_real):
        t = thermals[i].shape[0]
        clip_rows = jax.tree_util.tree_map(lambda a: a[:t, i], rows)
        host_carry = tracker_jax._HostCarry(backgrounds_np[i])
        host_carry.thermal_dev16 = th_dev[i]
        out.append((clip_rows, host_carry))
    return out
