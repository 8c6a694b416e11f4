"""Wide-ResNet backbone (Flax), the pipeline's default classifier.

Architecture parity with the reference's custom Keras WRResNet
(reference src/ml_tools/resnet/wr_resnet.py:5-98): depth-22 k=4 wide resnet
with grouped 3x3 convs (groups=2), pre-activation BN blocks, dropout 0.1
inside blocks, and stage strides (1, 2, 3) — including the reference's
unusual stride-3 final stage. The classifier head matches
kerasmodel.build_model: GAP -> optional dense stack -> dropout -> sigmoid
(multi-label) dense.

TPU notes: convs run in bfloat16 on the MXU with float32 accumulation
(preferred_element_type); BN statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """Pre-activation wide-resnet basic block with grouped convs."""

    f1: int
    f2: int
    stride: int = 1
    groups: int = 2
    dropout: float = 0.1
    # keras BatchNormalization default epsilon (reference wr_resnet.py uses
    # keras defaults); 1e-3 here makes TRAIN-mode batch normalization match
    # the reference's training numerics exactly (tests/test_train_oracle.py).
    # Inference from imported .keras weights is eps-exact either way: the
    # importer folds any epsilon difference into the running variance.
    bn_eps: float = 1e-3
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        shortcut = x
        y = nn.BatchNorm(use_running_average=not train, axis=-1,
                         epsilon=self.bn_eps, name="bn2a")(x)
        y = nn.relu(y)
        y = nn.Conv(
            self.f1,
            (3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=self.groups,
            dtype=self.compute_dtype,
            name="conv2a",
        )(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.BatchNorm(use_running_average=not train, axis=-1,
                         epsilon=self.bn_eps, name="bn2b")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.f2,
            (3, 3),
            strides=(1, 1),
            padding="SAME",
            feature_group_count=self.groups,
            dtype=self.compute_dtype,
            name="conv2b",
        )(y)
        if shortcut.shape[-1] != y.shape[-1]:
            shortcut = nn.Conv(
                y.shape[-1],
                (1, 1),
                strides=(self.stride, self.stride),
                feature_group_count=self.groups,
                dtype=self.compute_dtype,
                name="conv_shortcut",
            )(shortcut)
        return nn.relu(y + shortcut)


class WRResNet(nn.Module):
    """Backbone only; returns (N, H', W', 64k) feature maps."""

    depth: int = 22
    k: int = 4
    groups: int = 2
    bn_eps: float = 1e-3  # keras default; see BasicBlock.bn_eps
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        filters = [16, 16 * self.k, 32 * self.k, 64 * self.k]
        n = (self.depth - 4) // 6
        x = x.astype(self.compute_dtype)
        for stage, f in enumerate(filters):
            if stage == 0:
                x = nn.Conv(
                    f,
                    (3, 3),
                    strides=(1, 1),
                    padding="SAME",
                    feature_group_count=self.groups,
                    dtype=self.compute_dtype,
                    name="conv1",
                )(x)
            else:
                # reference wr_block: first block stride = stage index (1,2,3)
                for d in range(n):
                    x = BasicBlock(
                        f1=f,
                        f2=f,
                        stride=stage if d == 0 else 1,
                        groups=self.groups,
                        bn_eps=self.bn_eps,
                        compute_dtype=self.compute_dtype,
                        name=f"res{stage + 1}b{d}",
                    )(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, axis=-1,
                         epsilon=self.bn_eps, name="final_bn")(x)
        return nn.relu(x)


class LSTMClassifier(nn.Module):
    """Temporal variant (reference kerasmodel.add_lstm:775-791): the CNN
    backbone runs per frame (TimeDistributed), a GAP+dense embedding feeds an
    LSTM, then dense 1024 -> 512 -> softmax. Input (N, T, H, W, C)."""

    backbone: nn.Module
    num_labels: int
    lstm_units: int = 512
    dense_sizes: Sequence[int] | None = None
    dropout: float = 0.2  # keras LSTM(dropout=keep_prob) input dropout
    logits_only: bool = False
    preprocess_fn: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n, t = x.shape[0], x.shape[1]
        if self.preprocess_fn is not None:
            x = self.preprocess_fn(x)
        frames = x.reshape((n * t,) + x.shape[2:])
        feats = self.backbone(frames, train=train)
        feats = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)
        for i, size in enumerate(self.dense_sizes or ()):
            feats = nn.relu(nn.Dense(size, name=f"dense_{i}")(feats))
        feats = feats.reshape(n, t, feats.shape[-1])
        feats = nn.Dropout(self.dropout, deterministic=not train)(feats)
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.lstm_units), name="lstm")
        hidden = lstm(feats)[:, -1]  # return_state=False -> last output
        h = nn.relu(nn.Dense(1024, name="head_0")(hidden))
        h = nn.relu(nn.Dense(512, name="head_1")(h))
        logits = nn.Dense(self.num_labels, name="pred")(h)
        return logits if self.logits_only else nn.softmax(logits, axis=-1)


class Classifier(nn.Module):
    """Backbone + head (reference kerasmodel.build_model:259-378), with the
    optional MVM movement-feature branch (dense 128-128 over per-track
    statistical features concatenated with the GAP embedding)."""

    backbone: nn.Module
    num_labels: int
    dense_sizes: Sequence[int] | None = None
    dropout: float = 0.3
    multi_label: bool = True
    logits_only: bool = False
    mvm: bool = False
    # keras-style per-model input preprocessing (reference
    # interpreter.get_preprocess_fn :64-100 / kerasmodel.build_model stores
    # the fn next to the backbone); None = passthrough (wr-resnet,
    # efficientnet whose normalization lives in-model upstream)
    preprocess_fn: Any = None

    @nn.compact
    def __call__(self, x, features=None, *, train: bool = False):
        if self.preprocess_fn is not None:
            x = self.preprocess_fn(x)
        x = self.backbone(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # GlobalAveragePooling2D
        x = x.astype(jnp.float32)
        if self.mvm:
            if features is None:
                raise ValueError("mvm model requires a features input")
            f = nn.relu(nn.Dense(128, name="mvm_dense_0")(features))
            f = nn.relu(nn.Dense(128, name="mvm_dense_1")(f))
            f = nn.Dropout(0.1, deterministic=not train)(f)
            x = jnp.concatenate([x, f], axis=-1)
        if self.dense_sizes:
            for i, size in enumerate(self.dense_sizes):
                x = nn.relu(nn.Dense(size, name=f"dense_{i}")(x))
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_labels, name="prediction")(x)
        if self.logits_only:
            return logits
        if self.multi_label:
            return nn.sigmoid(logits)
        return nn.softmax(logits, axis=-1)
