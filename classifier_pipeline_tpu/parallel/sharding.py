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
