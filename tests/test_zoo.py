"""Backbone zoo structural parity vs tf.keras.applications (TEST ORACLE).

The reference builds its zoo from tf.keras.applications
(reference src/ml_tools/kerasmodel.py:101-231). Our Flax ports must have the
same layer graph; parameter-count equality at the same input shape is the
structural oracle (it catches wrong widths/depths/bias/BN-scale conventions).
EfficientNet v1 keras models carry 7 extra constants from their in-model
Normalization layer (mean/var/count), which our ports express as a
preprocessing function instead.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

KERAS_CASES = [
    # name, keras ctor path, input hw, extra keras params (Normalization)
    ("vgg16", "VGG16", 160, 0),
    ("vgg19", "VGG19", 160, 0),
    ("resnet", "ResNet50", 160, 0),
    ("resnet152", "ResNet152", 160, 0),
    ("resnetv2", "ResNet50V2", 160, 0),
    ("mobilenet", "MobileNetV2", 160, 0),
    ("densenet121", "DenseNet121", 160, 0),
    ("inceptionv3", "InceptionV3", 160, 0),
    ("inceptionresnetv2", "InceptionResNetV2", 160, 0),
    ("efficientnetb0", "EfficientNetB0", 160, 7),
    ("efficientnetb1", "EfficientNetB1", 160, 7),
    ("efficientnetb5", "EfficientNetB5", 160, 7),
    ("efficientnetv2b3", "EfficientNetV2B3", 160, 0),
    ("nasnet", "NASNetLarge", 331, 0),
]


def _flax_backbone(name):
    from classifier_pipeline_tpu.models.registry import BACKBONES

    return BACKBONES[name]({}, jnp.float32)


def _count_and_shape(mod, hw, ch=3):
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, ch)), train=False)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v))
    y = mod.apply(v, jnp.zeros((1, hw, hw, ch)), train=False, mutable=False)
    return n, tuple(y.shape[1:])


@pytest.mark.parametrize("name,keras_name,hw,extra", KERAS_CASES)
@pytest.mark.oracle
def test_backbone_matches_keras(name, keras_name, hw, extra):
    tf = pytest.importorskip("tensorflow")
    keras_model = getattr(tf.keras.applications, keras_name)(
        weights=None, include_top=False, input_shape=(hw, hw, 3)
    )
    want_params = keras_model.count_params()
    want_shape = tuple(keras_model.output_shape[1:])
    got_params, got_shape = _count_and_shape(_flax_backbone(name), hw)
    assert got_shape == want_shape
    assert got_params + extra == want_params


@pytest.mark.slow
def test_build_classifier_all_backbones_forward():
    """Every zoo entry builds through the reference head and runs a forward
    pass on the pipeline's real input shape (160x160 5x5-tiled segments)."""
    from classifier_pipeline_tpu.models.registry import BACKBONES, build_classifier

    x = jnp.zeros((2, 160, 160, 3), jnp.float32)
    # the big ones are covered by the keras-parity test; keep this fast
    for name in ["vgg16", "resnet", "mobilenet", "inceptionv3", "efficientnetb0"]:
        model = build_classifier(name, 9)
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(v, x, train=False, mutable=False)
        assert y.shape == (2, 9)
        assert bool(jnp.all(jnp.isfinite(y)))


def test_lstm_classifier():
    """reference kerasmodel.add_lstm (:775-791): TimeDistributed CNN -> LSTM
    -> dense 1024/512 -> softmax over (N, T, H, W, C) input."""
    from classifier_pipeline_tpu.models.registry import build_classifier

    model = build_classifier(
        "wr-resnet", 5,
        params={"lstm": True, "lstm_units": 64, "depth": 10, "k": 2},
        dense_sizes=[128],
    )
    x = jnp.zeros((2, 4, 32, 32, 2), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(v, x, train=False, mutable=False)
    assert y.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(jnp.sum(y, axis=-1)), 1.0, rtol=1e-5)


def test_preprocess_functions():
    from classifier_pipeline_tpu.models.zoo import PREPROCESS

    x = jnp.full((1, 4, 4, 3), 255.0)
    # caffe: BGR swap + mean subtract
    out = PREPROCESS["resnet"](x)
    assert float(out[..., 0].max()) == pytest.approx(255.0 - 103.939)
    # tf mode: [-1, 1]
    out = PREPROCESS["inceptionv3"](x)
    assert float(out.max()) == pytest.approx(1.0)
    # efficientnet v2 Bx, 2-channel thermal: x/128 - 1
    x2 = jnp.full((1, 4, 4, 2), 128.0)
    out = PREPROCESS["efficientnetv2b3"](x2)
    assert float(out.max()) == pytest.approx(0.0)
