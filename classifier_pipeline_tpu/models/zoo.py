"""Flax backbone zoo: native ports of the reference's tf.keras.applications
model families (reference src/ml_tools/kerasmodel.py:101-231).

Each module is architecture-faithful to its keras counterpart with
include_top=False (same layer graph, same conv/BN bias conventions — tests
assert parameter-count equality against tf.keras as the structural oracle)
but written as idiomatic Flax for TPU: NHWC, channels-last BN, bfloat16
compute on the MXU with float32 parameters/statistics.

Families (keras name -> reference config name, kerasmodel.py line):
  VGG16/VGG19             -> "vgg16"/"vgg19"        (:126-143)
  ResNet50/152, ResNet50V2-> "resnet"/"resnet152"/"resnetv2" (:103-125)
  MobileNetV2             -> "mobilenet"            (:144-152)
  DenseNet121             -> "densenet121"          (:153-161)
  InceptionV3             -> "inceptionv3"          (:171-180)
  InceptionResNetV2       -> "inceptionresnetv2"    (:162-170)
  EfficientNetB0/B1/B5    -> "efficientnetb0/b1/b5" (:181-207)
  EfficientNetV2B3        -> "efficientnetv2b3"     (:208-216)
  NASNetLarge             -> "nasnet"               (:217-223)

Per-model input preprocessing (the keras preprocess_input functions the
reference stores alongside each backbone) is in PREPROCESS at the bottom.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _maxpool(x, window, stride, padding="VALID"):
    return nn.max_pool(x, (window, window), (stride, stride), padding)


def _avgpool(x, window, stride, padding="VALID"):
    # keras/TF AveragePooling2D excludes SAME-padding cells from the divisor
    # (count_include_pad=False); numerically verified against tf.keras by the
    # weight-import oracles (tests/test_keras_import.py)
    return nn.avg_pool(
        x, (window, window), (stride, stride), padding, count_include_pad=False
    )


def _zeropad(x, pad):
    """ZeroPadding2D. pad is int or ((t,b),(l,r))."""
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    return jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))


def _correct_pad(x, kernel):
    """keras imagenet_utils.correct_pad: asymmetric pad for stride-2 convs."""
    ih, iw = x.shape[1], x.shape[2]
    adjust = (1 - ih % 2, 1 - iw % 2)
    correct = (kernel // 2, kernel // 2)
    return (
        (correct[0] - adjust[0], correct[0]),
        (correct[1] - adjust[1], correct[1]),
    )


class ConvBN(nn.Module):
    """Conv2D + BatchNorm [+ activation] with keras bias/scale conventions."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    bn: bool = True
    bn_scale: bool = True
    act: Any = nn.relu
    groups: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.compute_dtype,
            name="conv",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                use_scale=self.bn_scale,
                dtype=self.compute_dtype,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


# ---------------------------------------------------------------------------
# VGG (keras vgg16.py/vgg19.py: 3x3 SAME convs with bias, no BN, maxpools)
# ---------------------------------------------------------------------------


class VGG(nn.Module):
    blocks: Sequence[int]  # convs per block: VGG16 (2,2,3,3,3), VGG19 (2,2,4,4,4)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        del train
        x = x.astype(self.compute_dtype)
        filters = [64, 128, 256, 512, 512]
        for b, (n, f) in enumerate(zip(self.blocks, filters)):
            for c in range(n):
                x = nn.Conv(
                    f, (3, 3), padding="SAME", dtype=self.compute_dtype,
                    name=f"block{b + 1}_conv{c + 1}",
                )(x)
                x = nn.relu(x)
            x = _maxpool(x, 2, 2)
        return x


# ---------------------------------------------------------------------------
# ResNet v1 (keras resnet.py stack1/block1: post-activation bottlenecks,
# convs keep their biases, stride on the first 1x1 of each stage's block 1)
# ---------------------------------------------------------------------------


class _ResNetBlockV1(nn.Module):
    filters: int
    stride: int = 1
    conv_shortcut: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=dt, name=name
        )
        # module call order mirrors the keras .keras serialization order —
        # per shortcut block convs/BNs appear as (1, 2, 0=shortcut, 3) —
        # so the build-order weight importer (models/keras_import.py) maps
        # released ResNet archives without name heuristics
        y = nn.Conv(
            self.filters, (1, 1), strides=(self.stride, self.stride),
            dtype=dt, name="conv1",
        )(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=dt, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        if self.conv_shortcut:
            sc = nn.Conv(
                4 * self.filters, (1, 1), strides=(self.stride, self.stride),
                dtype=dt, name="conv_shortcut",
            )(x)
        else:
            sc = x
        y = nn.Conv(4 * self.filters, (1, 1), dtype=dt, name="conv3")(y)
        if self.conv_shortcut:
            sc = bn("bn_shortcut")(sc)
        y = bn("bn3")(y)
        return nn.relu(y + sc)


class ResNetV1(nn.Module):
    """ResNet50: depths (3,4,6,3); ResNet152: (3,8,36,3)."""

    depths: Sequence[int] = (3, 4, 6, 3)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        x = x.astype(dt)
        x = _zeropad(x, 3)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID", dtype=dt,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(x)
        x = nn.relu(x)
        x = _zeropad(x, 1)
        x = _maxpool(x, 3, 2)
        for stage, (depth, f) in enumerate(zip(self.depths, (64, 128, 256, 512))):
            for i in range(depth):
                x = _ResNetBlockV1(
                    filters=f,
                    stride=(1 if stage == 0 else 2) if i == 0 else 1,
                    conv_shortcut=i == 0,
                    compute_dtype=dt,
                    name=f"stage{stage + 1}_block{i + 1}",
                )(x, train=train)
        return x


# ---------------------------------------------------------------------------
# ResNet v2 (keras resnet_v2.py stack2/block2: pre-activation, stride on the
# LAST block of each stack, final post-BN+relu)
# ---------------------------------------------------------------------------


class _ResNetBlockV2(nn.Module):
    filters: int
    stride: int = 1
    conv_shortcut: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        # call order mirrors the keras .keras serialization order (convs
        # 1, 2, 0=shortcut, 3; BNs preact, 1, 2) for the weight importer
        preact = nn.BatchNorm(use_running_average=not train, dtype=dt,
                              name="preact_bn")(x)
        preact = nn.relu(preact)
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=dt, name="conv1")(
            preact
        )
        y = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        y = _zeropad(y, 1)
        y = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding="VALID", use_bias=False, dtype=dt, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn2")(y)
        y = nn.relu(y)
        if self.conv_shortcut:
            sc = nn.Conv(
                4 * self.filters, (1, 1), strides=(self.stride, self.stride),
                dtype=dt, name="conv_shortcut",
            )(preact)
        else:
            sc = _maxpool(x, 1, self.stride) if self.stride > 1 else x
        y = nn.Conv(4 * self.filters, (1, 1), dtype=dt, name="conv3")(y)
        return y + sc


class ResNetV2(nn.Module):
    """ResNet50V2: depths (3,4,6,3)."""

    depths: Sequence[int] = (3, 4, 6, 3)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        x = x.astype(dt)
        x = _zeropad(x, 3)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID", dtype=dt,
                    name="conv1")(x)
        x = _zeropad(x, 1)
        x = _maxpool(x, 3, 2)
        n_stacks = len(self.depths)
        for stage, (depth, f) in enumerate(zip(self.depths, (64, 128, 256, 512))):
            last_stride = 1 if stage == n_stacks - 1 else 2
            for i in range(depth):
                x = _ResNetBlockV2(
                    filters=f,
                    stride=last_stride if i == depth - 1 else 1,
                    conv_shortcut=i == 0,
                    compute_dtype=dt,
                    name=f"stage{stage + 1}_block{i + 1}",
                )(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="post_bn")(x)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# MobileNetV2 (keras mobilenet_v2.py, alpha=1.0)
# ---------------------------------------------------------------------------


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _InvertedResBlock(nn.Module):
    expansion: int
    filters: int
    stride: int
    block_id: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        in_ch = x.shape[-1]
        pointwise = _make_divisible(self.filters)
        y = x
        if self.block_id:
            y = nn.Conv(
                in_ch * self.expansion, (1, 1), use_bias=False, dtype=dt,
                name="expand",
            )(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name="expand_bn")(y)
            y = _relu6(y)
        if self.stride == 2:
            y = _zeropad(y, _correct_pad(y, 3))
            dw_pad = "VALID"
        else:
            dw_pad = "SAME"
        y = nn.Conv(
            y.shape[-1], (3, 3), strides=(self.stride, self.stride),
            padding=dw_pad, feature_group_count=y.shape[-1], use_bias=False,
            dtype=dt, name="depthwise",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="depthwise_bn")(y)
        y = _relu6(y)
        y = nn.Conv(pointwise, (1, 1), use_bias=False, dtype=dt, name="project")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="project_bn")(y)
        if in_ch == pointwise and self.stride == 1:
            return x + y
        return y


class MobileNetV2(nn.Module):
    alpha: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        x = x.astype(dt)
        first = _make_divisible(32 * self.alpha)
        x = _zeropad(x, _correct_pad(x, 3))
        x = nn.Conv(first, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=dt, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(x)
        x = _relu6(x)
        spec = [
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        block_id = 0
        for t, c, n, s in spec:
            for i in range(n):
                x = _InvertedResBlock(
                    expansion=t, filters=int(c * self.alpha),
                    stride=s if i == 0 else 1, block_id=block_id,
                    compute_dtype=dt, name=f"block_{block_id}",
                )(x, train=train)
                block_id += 1
        last = _make_divisible(1280 * max(self.alpha, 1.0))
        x = nn.Conv(last, (1, 1), use_bias=False, dtype=dt, name="conv_last")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn_last")(x)
        return _relu6(x)


# ---------------------------------------------------------------------------
# DenseNet121 (keras densenet.py: blocks (6,12,24,16), growth 32)
# ---------------------------------------------------------------------------


class DenseNet(nn.Module):
    blocks: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=dt, name=name
        )
        x = x.astype(dt)
        x = _zeropad(x, 3)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID", use_bias=False,
                    dtype=dt, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = _zeropad(x, 1)
        x = _maxpool(x, 3, 2)
        for b, n_layers in enumerate(self.blocks):
            for l in range(n_layers):
                y = nn.relu(bn(f"b{b}_l{l}_bn0")(x))
                y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=dt,
                            name=f"b{b}_l{l}_conv1")(y)
                y = nn.relu(bn(f"b{b}_l{l}_bn1")(y))
                y = nn.Conv(self.growth, (3, 3), padding="SAME", use_bias=False,
                            dtype=dt, name=f"b{b}_l{l}_conv2")(y)
                x = jnp.concatenate([x, y], axis=-1)
            if b != len(self.blocks) - 1:
                x = nn.relu(bn(f"t{b}_bn")(x))
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False, dtype=dt,
                            name=f"t{b}_conv")(x)
                x = _avgpool(x, 2, 2)
        x = nn.relu(bn("final_bn")(x))
        return x


# ---------------------------------------------------------------------------
# InceptionV3 (keras inception_v3.py: conv2d_bn has no bias, BN scale=False)
# ---------------------------------------------------------------------------


class InceptionV3(nn.Module):
    compute_dtype: jnp.dtype = jnp.float32

    def _cbr(self, x, f, kh, kw, strides=(1, 1), padding="SAME", *, train, name):
        x = ConvBN(
            f, (kh, kw), strides=strides, padding=padding, bn_scale=False,
            compute_dtype=self.compute_dtype, name=name,
        )(x, train=train)
        return x

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self._cbr
        x = x.astype(self.compute_dtype)
        x = c(x, 32, 3, 3, (2, 2), "VALID", train=train, name="stem1")
        x = c(x, 32, 3, 3, padding="VALID", train=train, name="stem2")
        x = c(x, 64, 3, 3, train=train, name="stem3")
        x = _maxpool(x, 3, 2)
        x = c(x, 80, 1, 1, padding="VALID", train=train, name="stem4")
        x = c(x, 192, 3, 3, padding="VALID", train=train, name="stem5")
        x = _maxpool(x, 3, 2)

        # mixed 0..2 (35x35)
        for i, pool_f in enumerate([32, 64, 64]):
            b0 = c(x, 64, 1, 1, train=train, name=f"m{i}_b0")
            b1 = c(x, 48, 1, 1, train=train, name=f"m{i}_b1a")
            b1 = c(b1, 64, 5, 5, train=train, name=f"m{i}_b1b")
            b2 = c(x, 64, 1, 1, train=train, name=f"m{i}_b2a")
            b2 = c(b2, 96, 3, 3, train=train, name=f"m{i}_b2b")
            b2 = c(b2, 96, 3, 3, train=train, name=f"m{i}_b2c")
            b3 = _avgpool(x, 3, 1, "SAME")
            b3 = c(b3, pool_f, 1, 1, train=train, name=f"m{i}_b3")
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # mixed 3 (17x17 reduction)
        b0 = c(x, 384, 3, 3, (2, 2), "VALID", train=train, name="m3_b0")
        b1 = c(x, 64, 1, 1, train=train, name="m3_b1a")
        b1 = c(b1, 96, 3, 3, train=train, name="m3_b1b")
        b1 = c(b1, 96, 3, 3, (2, 2), "VALID", train=train, name="m3_b1c")
        b2 = _maxpool(x, 3, 2)
        x = jnp.concatenate([b0, b1, b2], axis=-1)

        # mixed 4..7 (17x17, 7x1/1x7 factorized)
        for i, mid in enumerate([128, 160, 160, 192]):
            n = f"m{i + 4}"
            b0 = c(x, 192, 1, 1, train=train, name=f"{n}_b0")
            b1 = c(x, mid, 1, 1, train=train, name=f"{n}_b1a")
            b1 = c(b1, mid, 1, 7, train=train, name=f"{n}_b1b")
            b1 = c(b1, 192, 7, 1, train=train, name=f"{n}_b1c")
            b2 = c(x, mid, 1, 1, train=train, name=f"{n}_b2a")
            b2 = c(b2, mid, 7, 1, train=train, name=f"{n}_b2b")
            b2 = c(b2, mid, 1, 7, train=train, name=f"{n}_b2c")
            b2 = c(b2, mid, 7, 1, train=train, name=f"{n}_b2d")
            b2 = c(b2, 192, 1, 7, train=train, name=f"{n}_b2e")
            b3 = _avgpool(x, 3, 1, "SAME")
            b3 = c(b3, 192, 1, 1, train=train, name=f"{n}_b3")
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # mixed 8 (8x8 reduction)
        b0 = c(x, 192, 1, 1, train=train, name="m8_b0a")
        b0 = c(b0, 320, 3, 3, (2, 2), "VALID", train=train, name="m8_b0b")
        b1 = c(x, 192, 1, 1, train=train, name="m8_b1a")
        b1 = c(b1, 192, 1, 7, train=train, name="m8_b1b")
        b1 = c(b1, 192, 7, 1, train=train, name="m8_b1c")
        b1 = c(b1, 192, 3, 3, (2, 2), "VALID", train=train, name="m8_b1d")
        b2 = _maxpool(x, 3, 2)
        x = jnp.concatenate([b0, b1, b2], axis=-1)

        # mixed 9..10 (8x8, expanded)
        for i in range(2):
            n = f"m{i + 9}"
            b0 = c(x, 320, 1, 1, train=train, name=f"{n}_b0")
            b1 = c(x, 384, 1, 1, train=train, name=f"{n}_b1a")
            b1a = c(b1, 384, 1, 3, train=train, name=f"{n}_b1b")
            b1b = c(b1, 384, 3, 1, train=train, name=f"{n}_b1c")
            b1 = jnp.concatenate([b1a, b1b], axis=-1)
            b2 = c(x, 448, 1, 1, train=train, name=f"{n}_b2a")
            b2 = c(b2, 384, 3, 3, train=train, name=f"{n}_b2b")
            b2a = c(b2, 384, 1, 3, train=train, name=f"{n}_b2c")
            b2b = c(b2, 384, 3, 1, train=train, name=f"{n}_b2d")
            b2 = jnp.concatenate([b2a, b2b], axis=-1)
            b3 = _avgpool(x, 3, 1, "SAME")
            b3 = c(b3, 192, 1, 1, train=train, name=f"{n}_b3")
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        return x


# ---------------------------------------------------------------------------
# InceptionResNetV2 (keras inception_resnet_v2.py)
# ---------------------------------------------------------------------------


class InceptionResNetV2(nn.Module):
    compute_dtype: jnp.dtype = jnp.float32

    def _cbr(self, x, f, kh, kw, strides=(1, 1), padding="SAME", act=True,
             *, train, name):
        return ConvBN(
            f, (kh, kw), strides=strides, padding=padding, bn_scale=False,
            act=nn.relu if act else None, compute_dtype=self.compute_dtype,
            name=name,
        )(x, train=train)

    def _resblock(self, x, branches, up_filters, scale, *, act=True, train, name):
        mixed = jnp.concatenate(branches, axis=-1)
        up = nn.Conv(
            up_filters, (1, 1), use_bias=True, dtype=self.compute_dtype,
            name=f"{name}_up",
        )(mixed)
        x = x + scale * up
        return nn.relu(x) if act else x

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self._cbr
        x = x.astype(self.compute_dtype)
        x = c(x, 32, 3, 3, (2, 2), "VALID", train=train, name="stem1")
        x = c(x, 32, 3, 3, padding="VALID", train=train, name="stem2")
        x = c(x, 64, 3, 3, train=train, name="stem3")
        x = _maxpool(x, 3, 2)
        x = c(x, 80, 1, 1, padding="VALID", train=train, name="stem4")
        x = c(x, 192, 3, 3, padding="VALID", train=train, name="stem5")
        x = _maxpool(x, 3, 2)

        # mixed_5b
        b0 = c(x, 96, 1, 1, train=train, name="m5b_b0")
        b1 = c(x, 48, 1, 1, train=train, name="m5b_b1a")
        b1 = c(b1, 64, 5, 5, train=train, name="m5b_b1b")
        b2 = c(x, 64, 1, 1, train=train, name="m5b_b2a")
        b2 = c(b2, 96, 3, 3, train=train, name="m5b_b2b")
        b2 = c(b2, 96, 3, 3, train=train, name="m5b_b2c")
        b3 = _avgpool(x, 3, 1, "SAME")
        b3 = c(b3, 64, 1, 1, train=train, name="m5b_b3")
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # 10x block35
        for i in range(10):
            n = f"b35_{i}"
            b0 = c(x, 32, 1, 1, train=train, name=f"{n}_b0")
            b1 = c(x, 32, 1, 1, train=train, name=f"{n}_b1a")
            b1 = c(b1, 32, 3, 3, train=train, name=f"{n}_b1b")
            b2 = c(x, 32, 1, 1, train=train, name=f"{n}_b2a")
            b2 = c(b2, 48, 3, 3, train=train, name=f"{n}_b2b")
            b2 = c(b2, 64, 3, 3, train=train, name=f"{n}_b2c")
            x = self._resblock(x, [b0, b1, b2], 320, 0.17, train=train, name=n)

        # mixed_6a
        b0 = c(x, 384, 3, 3, (2, 2), "VALID", train=train, name="m6a_b0")
        b1 = c(x, 256, 1, 1, train=train, name="m6a_b1a")
        b1 = c(b1, 256, 3, 3, train=train, name="m6a_b1b")
        b1 = c(b1, 384, 3, 3, (2, 2), "VALID", train=train, name="m6a_b1c")
        b2 = _maxpool(x, 3, 2)
        x = jnp.concatenate([b0, b1, b2], axis=-1)

        # 20x block17
        for i in range(20):
            n = f"b17_{i}"
            b0 = c(x, 192, 1, 1, train=train, name=f"{n}_b0")
            b1 = c(x, 128, 1, 1, train=train, name=f"{n}_b1a")
            b1 = c(b1, 160, 1, 7, train=train, name=f"{n}_b1b")
            b1 = c(b1, 192, 7, 1, train=train, name=f"{n}_b1c")
            x = self._resblock(x, [b0, b1], 1088, 0.1, train=train, name=n)

        # mixed_7a
        b0 = c(x, 256, 1, 1, train=train, name="m7a_b0a")
        b0 = c(b0, 384, 3, 3, (2, 2), "VALID", train=train, name="m7a_b0b")
        b1 = c(x, 256, 1, 1, train=train, name="m7a_b1a")
        b1 = c(b1, 288, 3, 3, (2, 2), "VALID", train=train, name="m7a_b1b")
        b2 = c(x, 256, 1, 1, train=train, name="m7a_b2a")
        b2 = c(b2, 288, 3, 3, train=train, name="m7a_b2b")
        b2 = c(b2, 320, 3, 3, (2, 2), "VALID", train=train, name="m7a_b2c")
        b3 = _maxpool(x, 3, 2)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # 10x block8 (9 with relu, final scale=1 no activation)
        for i in range(10):
            n = f"b8_{i}"
            b0 = c(x, 192, 1, 1, train=train, name=f"{n}_b0")
            b1 = c(x, 192, 1, 1, train=train, name=f"{n}_b1a")
            b1 = c(b1, 224, 1, 3, train=train, name=f"{n}_b1b")
            b1 = c(b1, 256, 3, 1, train=train, name=f"{n}_b1c")
            last = i == 9
            x = self._resblock(
                x, [b0, b1], 2080, 1.0 if last else 0.2, act=not last,
                train=train, name=n,
            )
        x = c(x, 1536, 1, 1, train=train, name="conv_7b")
        return x


# ---------------------------------------------------------------------------
# EfficientNet v1 (keras efficientnet.py)
# ---------------------------------------------------------------------------

_EFFNET_BLOCKS = [
    # kernel, repeats, filters_in, filters_out, expand, stride, se
    (3, 1, 32, 16, 1, 1, 0.25),
    (3, 2, 16, 24, 6, 2, 0.25),
    (5, 2, 24, 40, 6, 2, 0.25),
    (3, 3, 40, 80, 6, 2, 0.25),
    (5, 3, 80, 112, 6, 1, 0.25),
    (5, 4, 112, 192, 6, 2, 0.25),
    (3, 1, 192, 320, 6, 1, 0.25),
]


def _round_filters(filters, width, divisor=8, v2=False):
    """keras round_filters. v1 bumps up when rounding lost >10%
    (efficientnet.py); v2 does not (efficientnet_v2.py)."""
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if not v2 and new < 0.9 * filters:
        new += divisor
    return int(new)


def _round_repeats(repeats, depth):
    return int(math.ceil(depth * repeats))


class _MBConv(nn.Module):
    kernel: int
    filters_in: int
    filters_out: int
    expand: int
    stride: int
    se_ratio: float
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        inp = x
        filters = self.filters_in * self.expand
        if self.expand != 1:
            x = nn.Conv(filters, (1, 1), use_bias=False, dtype=dt,
                        name="expand_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name="expand_bn")(x)
            x = nn.swish(x)
        if self.stride == 2:
            x = _zeropad(x, _correct_pad(x, self.kernel))
            pad = "VALID"
        else:
            pad = "SAME"
        x = nn.Conv(
            filters, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=pad,
            feature_group_count=filters, use_bias=False, dtype=dt,
            name="dwconv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn")(x)
        x = nn.swish(x)
        if 0 < self.se_ratio <= 1:
            se_f = max(1, int(self.filters_in * self.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(se_f, (1, 1), dtype=dt, name="se_reduce")(se)
            se = nn.swish(se)
            se = nn.Conv(filters, (1, 1), dtype=dt, name="se_expand")(se)
            x = x * nn.sigmoid(se)
        x = nn.Conv(self.filters_out, (1, 1), use_bias=False, dtype=dt,
                    name="project_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="project_bn")(x)
        if self.stride == 1 and self.filters_in == self.filters_out:
            x = x + inp
        return x


class EfficientNet(nn.Module):
    """B0 (1.0, 1.0), B1 (1.0, 1.1), B5 (1.6, 2.2)."""

    width: float = 1.0
    depth: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        x = x.astype(dt)
        x = _zeropad(x, _correct_pad(x, 3))
        x = nn.Conv(
            _round_filters(32, self.width), (3, 3), strides=(2, 2),
            padding="VALID", use_bias=False, dtype=dt, name="stem_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="stem_bn")(x)
        x = nn.swish(x)
        blk = 0
        for k, r, f_in, f_out, e, s, se in _EFFNET_BLOCKS:
            f_in = _round_filters(f_in, self.width)
            f_out = _round_filters(f_out, self.width)
            for i in range(_round_repeats(r, self.depth)):
                x = _MBConv(
                    kernel=k,
                    filters_in=f_in if i == 0 else f_out,
                    filters_out=f_out,
                    expand=e,
                    stride=s if i == 0 else 1,
                    se_ratio=se,
                    compute_dtype=dt,
                    name=f"block{blk}",
                )(x, train=train)
                blk += 1
        x = nn.Conv(
            _round_filters(1280, self.width), (1, 1), use_bias=False, dtype=dt,
            name="top_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="top_bn")(x)
        return nn.swish(x)


# ---------------------------------------------------------------------------
# EfficientNetV2-B3 (keras efficientnet_v2.py, base config w=1.2 d=1.4)
# ---------------------------------------------------------------------------

_EFFNETV2_BASE_BLOCKS = [
    # conv_type(fused?), kernel, repeats, in, out, expand, stride, se
    (True, 3, 1, 32, 16, 1, 1, 0.0),
    (True, 3, 2, 16, 32, 4, 2, 0.0),
    (True, 3, 2, 32, 48, 4, 2, 0.0),
    (False, 3, 3, 48, 96, 4, 2, 0.25),
    (False, 3, 5, 96, 112, 6, 1, 0.25),
    (False, 3, 8, 112, 192, 6, 2, 0.25),
]


class _FusedMBConv(nn.Module):
    kernel: int
    filters_in: int
    filters_out: int
    expand: int
    stride: int
    se_ratio: float
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        inp = x
        filters = self.filters_in * self.expand
        if self.expand != 1:
            x = nn.Conv(
                filters, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding="SAME",
                use_bias=False, dtype=dt, name="expand_conv",
            )(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name="expand_bn")(x)
            x = nn.swish(x)
        if 0 < self.se_ratio <= 1:
            se_f = max(1, int(self.filters_in * self.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(se_f, (1, 1), dtype=dt, name="se_reduce")(se)
            se = nn.swish(se)
            se = nn.Conv(filters, (1, 1), dtype=dt, name="se_expand")(se)
            x = x * nn.sigmoid(se)
        x = nn.Conv(
            self.filters_out,
            (1, 1) if self.expand != 1 else (self.kernel, self.kernel),
            strides=(1, 1) if self.expand != 1 else (self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=dt, name="project_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="project_bn")(x)
        if self.expand == 1:
            x = nn.swish(x)
        if self.stride == 1 and self.filters_in == self.filters_out:
            x = x + inp
        return x


class _MBConvV2(nn.Module):
    """V2 MBConv: SAME-padded depthwise (no correct_pad), SE on input filters."""

    kernel: int
    filters_in: int
    filters_out: int
    expand: int
    stride: int
    se_ratio: float
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        inp = x
        filters = self.filters_in * self.expand
        if self.expand != 1:
            x = nn.Conv(filters, (1, 1), use_bias=False, dtype=dt,
                        name="expand_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name="expand_bn")(x)
            x = nn.swish(x)
        x = nn.Conv(
            filters, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=filters, use_bias=False, dtype=dt,
            name="dwconv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn")(x)
        x = nn.swish(x)
        if 0 < self.se_ratio <= 1:
            se_f = max(1, int(self.filters_in * self.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(se_f, (1, 1), dtype=dt, name="se_reduce")(se)
            se = nn.swish(se)
            se = nn.Conv(filters, (1, 1), dtype=dt, name="se_expand")(se)
            x = x * nn.sigmoid(se)
        x = nn.Conv(self.filters_out, (1, 1), use_bias=False, dtype=dt,
                    name="project_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="project_bn")(x)
        if self.stride == 1 and self.filters_in == self.filters_out:
            x = x + inp
        return x


class EfficientNetV2(nn.Module):
    """EfficientNetV2B3: width=1.2, depth=1.4 over the base block config."""

    width: float = 1.2
    depth: float = 1.4
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        x = x.astype(dt)
        stem = _round_filters(32, self.width, v2=True)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=dt, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="stem_bn")(x)
        x = nn.swish(x)
        blk = 0
        for fused, k, r, f_in, f_out, e, s, se in _EFFNETV2_BASE_BLOCKS:
            f_in = _round_filters(f_in, self.width, v2=True)
            f_out = _round_filters(f_out, self.width, v2=True)
            cls = _FusedMBConv if fused else _MBConvV2
            for i in range(_round_repeats(r, self.depth)):
                x = cls(
                    kernel=k,
                    filters_in=f_in if i == 0 else f_out,
                    filters_out=f_out,
                    expand=e,
                    stride=s if i == 0 else 1,
                    se_ratio=se,
                    compute_dtype=dt,
                    name=f"block{blk}",
                )(x, train=train)
                blk += 1
        x = nn.Conv(_round_filters(1280, self.width, v2=True), (1, 1), use_bias=False,
                    dtype=dt, name="top_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="top_bn")(x)
        return nn.swish(x)


# ---------------------------------------------------------------------------
# per-model input preprocessing (the keras preprocess_input functions that
# kerasmodel.get_base_model returns next to each backbone)
# ---------------------------------------------------------------------------

_CAFFE_MEAN = jnp.array([103.939, 116.779, 123.68], jnp.float32)


def _preprocess_caffe(x):
    """keras 'caffe' mode: RGB->BGR, subtract ImageNet means (resnet, vgg)."""
    x = x[..., ::-1] if x.shape[-1] == 3 else x
    mean = _CAFFE_MEAN[: x.shape[-1]]
    return x.astype(jnp.float32) - mean


def _preprocess_tf(x):
    """keras 'tf' mode: scale to [-1, 1] (resnetv2, inception*, mobilenet,
    nasnet)."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def _preprocess_none(x):
    return x.astype(jnp.float32)


PREPROCESS = {
    "resnet": _preprocess_caffe,
    "resnet152": _preprocess_caffe,
    "vgg16": _preprocess_caffe,
    "vgg19": _preprocess_caffe,
    "resnetv2": _preprocess_tf,
    "mobilenet": _preprocess_tf,
    "inceptionv3": _preprocess_tf,
    "inceptionresnetv2": _preprocess_tf,
    "nasnet": _preprocess_tf,
    "densenet121": _preprocess_tf,  # keras densenet uses 'torch'; see below
    "efficientnetb0": None,  # set below (in-model preprocessing in keras)
    "efficientnetb1": None,
    "efficientnetb5": None,
    "efficientnetv2b3": None,
    "wr-resnet": _preprocess_none,
    "simple-cnn": _preprocess_none,
}


def _preprocess_torch(x):
    """keras 'torch' mode: /255, normalize by ImageNet mean/std (densenet)."""
    mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)[: x.shape[-1]]
    std = jnp.array([0.229, 0.224, 0.225], jnp.float32)[: x.shape[-1]]
    return (x.astype(jnp.float32) / 255.0 - mean) / std


def _preprocess_effnet_v1(x):
    """keras EfficientNet v1 embeds Rescaling(1/255) + Normalization in the
    model (efficientnet.py:325-326); un-adapted (scratch training, as the
    reference uses for thermal inputs) the Normalization is identity."""
    return x.astype(jnp.float32) / 255.0


def _preprocess_effnet_v2bx(x):
    """keras EfficientNetV2 Bx in-model preprocessing (efficientnet_v2.py:
    932-952): torch-mode normalize for 3-channel inputs, else [-1,1] via
    x/128 - 1."""
    if x.shape[-1] == 3:
        return _preprocess_torch(x)
    return x.astype(jnp.float32) / 128.0 - 1.0


PREPROCESS["densenet121"] = _preprocess_torch
PREPROCESS["efficientnetb0"] = _preprocess_effnet_v1
PREPROCESS["efficientnetb1"] = _preprocess_effnet_v1
PREPROCESS["efficientnetb5"] = _preprocess_effnet_v1
PREPROCESS["efficientnetv2b3"] = _preprocess_effnet_v2bx


# ---------------------------------------------------------------------------
# NASNet-A Large (keras nasnet.py: penultimate 4032, 6 blocks, stem 96,
# skip_reduction=True, filter_multiplier=2). BN eps 1e-3 mom .9997 (shape-
# irrelevant); separable blocks are [relu, sepconv, BN] x2, all bias-free.
# ---------------------------------------------------------------------------


class _SepConvBlock(nn.Module):
    filters: int
    kernel: int = 3
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        x = nn.relu(x)
        if self.stride == 2:
            x = _zeropad(x, _correct_pad(x, self.kernel))
            pad = "VALID"
        else:
            pad = "SAME"
        cin = x.shape[-1]
        x = nn.Conv(cin, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=cin, use_bias=False, dtype=dt,
                    name="dw1")(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=dt, name="pw1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(x)
        x = nn.relu(x)
        cin = x.shape[-1]
        x = nn.Conv(cin, (self.kernel, self.kernel), padding="SAME",
                    feature_group_count=cin, use_bias=False, dtype=dt,
                    name="dw2")(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=dt, name="pw2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn2")(x)
        return x


class _NASNetCell(nn.Module):
    """One NASNet-A cell (normal or reduction) incl. the p-adjust block."""

    filters: int
    reduction: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    def _adjust(self, p, ip, *, train):
        dt = self.compute_dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not train, dtype=dt,
                                       name=name)
        if p is None:
            return ip
        if p.shape[1] != ip.shape[1]:
            p = nn.relu(p)
            p1 = _avgpool(p, 1, 2)
            p1 = nn.Conv(self.filters // 2, (1, 1), use_bias=False, dtype=dt,
                         name="adjust_conv_1")(p1)
            p2 = _zeropad(p, ((0, 1), (0, 1)))[:, 1:, 1:, :]
            p2 = _avgpool(p2, 1, 2)
            p2 = nn.Conv(self.filters // 2, (1, 1), use_bias=False, dtype=dt,
                         name="adjust_conv_2")(p2)
            p = jnp.concatenate([p1, p2], axis=-1)
            return bn("adjust_bn")(p)
        if p.shape[-1] != self.filters:
            p = nn.relu(p)
            p = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=dt,
                        name="adjust_conv_projection")(p)
            return bn("adjust_bn")(p)
        return p

    @nn.compact
    def __call__(self, ip, p, *, train: bool):
        dt = self.compute_dtype
        f = self.filters
        p = self._adjust(p, ip, train=train)
        h = nn.relu(ip)
        h = nn.Conv(f, (1, 1), use_bias=False, dtype=dt, name="conv_1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=dt, name="bn_1")(h)
        sep = lambda k, s, name: _SepConvBlock(
            filters=f, kernel=k, stride=s, compute_dtype=dt, name=name
        )
        if not self.reduction:
            x1 = sep(5, 1, "left1")(h, train=train) + sep(3, 1, "right1")(
                p, train=train
            )
            x2 = sep(5, 1, "left2")(p, train=train) + sep(3, 1, "right2")(
                p, train=train
            )
            x3 = _avgpool(h, 3, 1, "SAME") + p
            x4 = _avgpool(p, 3, 1, "SAME") + _avgpool(p, 3, 1, "SAME")
            x5 = sep(3, 1, "left5")(h, train=train) + h
            return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1), ip
        h3 = _zeropad(h, _correct_pad(h, 3))
        x1 = sep(5, 2, "left1")(h, train=train) + sep(7, 2, "right1")(
            p, train=train
        )
        x2 = _maxpool(h3, 3, 2) + sep(7, 2, "right2")(p, train=train)
        x3 = _avgpool(h3, 3, 2) + sep(5, 2, "right3")(p, train=train)
        x4 = x2 + _avgpool(x1, 3, 1, "SAME")
        x5 = sep(3, 1, "left5")(x1, train=train) + _maxpool(h3, 3, 2)
        return jnp.concatenate([x2, x3, x4, x5], axis=-1), ip


class NASNetLarge(nn.Module):
    penultimate_filters: int = 4032
    num_blocks: int = 6
    stem_filters: int = 96
    filter_multiplier: int = 2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        filters = self.penultimate_filters // 24
        fm = self.filter_multiplier
        x = x.astype(dt)
        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=dt, name="stem_conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                         name="stem_bn1")(x)
        p = None
        cell = lambda f, red, name: _NASNetCell(
            filters=f, reduction=red, compute_dtype=dt, name=name
        )
        x, p = cell(filters // (fm**2), True, "stem_1")(x, p, train=train)
        x, p = cell(filters // fm, True, "stem_2")(x, p, train=train)
        for i in range(self.num_blocks):
            x, p = cell(filters, False, f"normal_{i}")(x, p, train=train)
        x, p0 = cell(filters * fm, True, f"reduce_{self.num_blocks}")(
            x, p, train=train
        )
        del p0  # skip_reduction=True keeps the pre-reduction p
        for i in range(self.num_blocks):
            x, p = cell(filters * fm, False,
                        f"normal_{self.num_blocks + i + 1}")(x, p, train=train)
        x, p0 = cell(filters * fm**2, True, f"reduce_{2 * self.num_blocks}")(
            x, p, train=train
        )
        del p0
        for i in range(self.num_blocks):
            x, p = cell(filters * fm**2, False,
                        f"normal_{2 * self.num_blocks + i + 1}")(x, p, train=train)
        return nn.relu(x)
