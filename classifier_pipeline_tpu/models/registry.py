"""Backbone registry (reference kerasmodel.get_base_model's model zoo).

The reference delegates most backbones to tf.keras.applications; here each is
a Flax module. "wr-resnet" (the shipped default) and the natively defined
nets are implemented; ImageNet-pretrained exotics raise with a clear message
until their ports land.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .wr_resnet import Classifier, WRResNet


class SimpleCNN(nn.Module):
    """Small convnet — fast fallback / FP-gate-scale model."""

    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = x.astype(self.compute_dtype)
        for i, f in enumerate([32, 64, 128]):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME", name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


BACKBONES = {
    "wr-resnet": lambda params, dtype: WRResNet(
        depth=params.get("depth", 22), k=params.get("k", 4), compute_dtype=dtype
    ),
    "simple-cnn": lambda params, dtype: SimpleCNN(compute_dtype=dtype),
}

# reference zoo names not yet natively ported — fail loudly, not silently
PENDING_BACKBONES = [
    "resnet", "resnetv2", "resnet152", "vgg16", "vgg19", "mobilenet",
    "densenet121", "inceptionresnetv2", "inceptionv3", "efficientnetb0",
    "efficientnetb1", "efficientnetb5", "efficientnetv2b3", "nasnet",
]


def build_classifier(
    model_name: str,
    num_labels: int,
    params: dict | None = None,
    dense_sizes=None,
    dropout: float = 0.3,
    multi_label: bool = True,
    compute_dtype=jnp.float32,
    logits_only: bool = False,
) -> Classifier:
    params = params or {}
    if model_name not in BACKBONES:
        if model_name in PENDING_BACKBONES:
            raise NotImplementedError(
                f"backbone {model_name!r} is in the reference zoo but not yet "
                f"ported; available: {sorted(BACKBONES)}"
            )
        raise ValueError(f"unknown backbone {model_name!r}")
    backbone = BACKBONES[model_name](params, compute_dtype)
    return Classifier(
        backbone=backbone,
        num_labels=num_labels,
        dense_sizes=dense_sizes,
        dropout=dropout,
        multi_label=multi_label,
        logits_only=logits_only,
        mvm=bool(params.get("mvm", False)),
    )
