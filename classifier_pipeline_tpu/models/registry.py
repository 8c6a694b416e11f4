"""Backbone registry (reference kerasmodel.get_base_model's model zoo).

The reference delegates most backbones to tf.keras.applications; here each is
a Flax module. "wr-resnet" (the shipped default) and the natively defined
nets are implemented; ImageNet-pretrained exotics raise with a clear message
until their ports land.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from . import zoo
from .wr_resnet import Classifier, LSTMClassifier, WRResNet


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
    # tf.keras.applications equivalents (reference kerasmodel.py:101-231),
    # implemented natively in models/zoo.py and verified against keras by
    # parameter-count equality (tests/test_zoo.py)
    "vgg16": lambda params, dtype: zoo.VGG(blocks=(2, 2, 3, 3, 3), compute_dtype=dtype),
    "vgg19": lambda params, dtype: zoo.VGG(blocks=(2, 2, 4, 4, 4), compute_dtype=dtype),
    "resnet": lambda params, dtype: zoo.ResNetV1(depths=(3, 4, 6, 3), compute_dtype=dtype),
    "resnet152": lambda params, dtype: zoo.ResNetV1(depths=(3, 8, 36, 3), compute_dtype=dtype),
    "resnetv2": lambda params, dtype: zoo.ResNetV2(compute_dtype=dtype),
    "mobilenet": lambda params, dtype: zoo.MobileNetV2(compute_dtype=dtype),
    "densenet121": lambda params, dtype: zoo.DenseNet(compute_dtype=dtype),
    "inceptionv3": lambda params, dtype: zoo.InceptionV3(compute_dtype=dtype),
    "inceptionresnetv2": lambda params, dtype: zoo.InceptionResNetV2(compute_dtype=dtype),
    "efficientnetb0": lambda params, dtype: zoo.EfficientNet(1.0, 1.0, compute_dtype=dtype),
    "efficientnetb1": lambda params, dtype: zoo.EfficientNet(1.0, 1.1, compute_dtype=dtype),
    "efficientnetb5": lambda params, dtype: zoo.EfficientNet(1.6, 2.2, compute_dtype=dtype),
    "efficientnetv2b3": lambda params, dtype: zoo.EfficientNetV2(1.2, 1.4, compute_dtype=dtype),
    "nasnet": lambda params, dtype: zoo.NASNetLarge(compute_dtype=dtype),
}

# reference zoo names not yet natively ported — fail loudly, not silently
PENDING_BACKBONES: list[str] = []


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
    preprocess_fn = zoo.PREPROCESS.get(model_name)
    if params.get("lstm"):
        return LSTMClassifier(
            backbone=backbone,
            num_labels=num_labels,
            lstm_units=int(params.get("lstm_units", 512)),
            dense_sizes=dense_sizes,
            dropout=float(params.get("keep_prob", 0.2)),
            logits_only=logits_only,
            preprocess_fn=preprocess_fn,
        )
    return Classifier(
        backbone=backbone,
        num_labels=num_labels,
        dense_sizes=dense_sizes,
        dropout=dropout,
        multi_label=multi_label,
        logits_only=logits_only,
        mvm=bool(params.get("mvm", False)),
        preprocess_fn=preprocess_fn,
    )
