"""Model artifact save/load helpers.

Artifact = <prefix>.json (reference-schema metadata) + <prefix>.msgpack
(flax.serialization of the variables pytree). Mirrors the reference's
save-side metadata (kerasmodel.py:456-505).
"""

from __future__ import annotations

import json
from pathlib import Path

import flax.serialization
import jax
import jax.numpy as jnp

from .registry import build_classifier

DEFAULT_LABELS = [
    "bird", "cat", "deer", "dog", "false-positive", "hedgehog", "human",
    "kiwi", "leporidae", "mustelid", "penguin", "possum", "rodent", "sheep",
    "vehicle", "wallaby", "land-bird",
]


def save_model(prefix, variables, labels, hyperparams=None, thresholds=None,
               version=None, extra_meta=None):
    prefix = Path(prefix)
    prefix.parent.mkdir(parents=True, exist_ok=True)
    meta = {
        "version": version,
        "labels": list(labels),
        "type": "thermal",
        "hyperparams": hyperparams or {},
    }
    if thresholds is not None:
        meta["thresholds"] = thresholds
    if extra_meta:
        meta.update(extra_meta)
    prefix.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    prefix.with_suffix(".msgpack").write_bytes(
        flax.serialization.to_bytes(variables)
    )
    return prefix


def create_model(prefix, labels=None, model_name="wr-resnet", hyperparams=None,
                 rng_seed=0):
    """Initialize a model with fresh weights and write the artifact pair.
    Used by tests and as the starting point for training."""
    labels = labels or DEFAULT_LABELS
    hp = {"model_name": model_name}
    hp.update(hyperparams or {})
    frame_size = hp.get("frame_size", 32)
    square_width = hp.get("square_width", 5)
    channels = hp.get("channels", ["thermal", "filtered"])
    model = build_classifier(model_name, len(labels), params=hp)
    size = frame_size * square_width
    dummy = jnp.zeros((1, size, size, len(channels)), jnp.float32)
    if hp.get("mvm"):
        from .forest import MVM_FEATURE_DIM

        feats = jnp.zeros((1, MVM_FEATURE_DIM), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(rng_seed), dummy, feats, train=False
        )
    else:
        variables = model.init(jax.random.PRNGKey(rng_seed), dummy, train=False)
    return save_model(prefix, variables, labels, hyperparams=hp)
