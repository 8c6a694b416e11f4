#!/usr/bin/env python3
"""Probe keras-weight-import output equality across zoo families.

For each (registry name, keras builder) pair: build the keras model with
seeded random weights, save a .keras, import into the Flax twin, compare
outputs. Prints PASS/FAIL + max abs diff per family. Used to decide which
families get promoted into tests/test_keras_import.py oracles.

Run on CPU: python tools/keras_import_probe.py [family ...]
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def keras_builders(tf):
    K = tf.keras.applications
    return {
        "resnet": lambda s: K.ResNet50(weights=None, include_top=False, input_shape=s),
        "resnet152": lambda s: K.ResNet152(weights=None, include_top=False, input_shape=s),
        "resnetv2": lambda s: K.ResNet50V2(weights=None, include_top=False, input_shape=s),
        "vgg16": lambda s: K.VGG16(weights=None, include_top=False, input_shape=s),
        "vgg19": lambda s: K.VGG19(weights=None, include_top=False, input_shape=s),
        "densenet121": lambda s: K.DenseNet121(weights=None, include_top=False, input_shape=s),
        "mobilenet": lambda s: K.MobileNetV2(weights=None, include_top=False, input_shape=s),
        "inceptionv3": lambda s: K.InceptionV3(weights=None, include_top=False, input_shape=s),
        "inceptionresnetv2": lambda s: K.InceptionResNetV2(weights=None, include_top=False, input_shape=s),
        "efficientnetb0": lambda s: K.EfficientNetB0(weights=None, include_top=False, input_shape=s),
        "efficientnetb1": lambda s: K.EfficientNetB1(weights=None, include_top=False, input_shape=s),
        "efficientnetb5": lambda s: K.EfficientNetB5(weights=None, include_top=False, input_shape=s),
        "efficientnetv2b3": lambda s: K.EfficientNetV2B3(weights=None, include_top=False, input_shape=s),
        "nasnet": lambda s: K.NASNetLarge(weights=None, include_top=False, input_shape=s),
    }


# families whose KERAS model embeds its preprocessing as layers
# (Rescaling/Normalization built from constants — efficientnet.py:325-326,
# efficientnet_v2.py:932-952); the zoo expresses those as PREPROCESS
# functions, so the flax side must apply them for a fair comparison
INTERNAL_PREPROCESS = {
    "efficientnetb0", "efficientnetb1", "efficientnetb5", "efficientnetv2b3",
}


def probe(name, builder):
    import tensorflow as tf

    from test_keras_import import _randomize_weights  # shared scheme

    from classifier_pipeline_tpu.models.keras_import import import_keras_weights
    from classifier_pipeline_tpu.models.registry import BACKBONES
    from classifier_pipeline_tpu.models.zoo import PREPROCESS

    shape = (160, 160, 3)
    keras_model = builder(shape)
    _randomize_weights(keras_model, seed=23,
                       mild=name.startswith("efficientnetv2"))
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / f"{name}.keras"
        keras_model.save(str(path))
        flax_model = BACKBONES[name]({}, jnp.float32)
        variables = flax_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + shape), train=False
        )
        variables = import_keras_weights(variables, path)

    rng = np.random.RandomState(29)
    if name in INTERNAL_PREPROCESS:
        x = rng.uniform(0, 255, (2,) + shape).astype(np.float32)
        x_flax = np.asarray(PREPROCESS[name](jnp.asarray(x)), np.float32)
    else:
        x = rng.uniform(-1, 1, (2,) + shape).astype(np.float32)
        x_flax = x
    want = keras_model.predict(x, verbose=0)
    got = np.asarray(
        flax_model.apply(variables, jnp.asarray(x_flax), train=False,
                         mutable=False)
    )
    scale = max(1.0, float(np.abs(want).max()))
    diff = float(np.abs(got - want).max())
    ok = diff <= 2e-3 * scale + 1e-4 * scale
    print(f"{name}: {'PASS' if ok else 'FAIL'} max_abs_diff={diff:.3e} "
          f"out_scale={scale:.1f}")
    return ok


def main():
    import tensorflow as tf

    builders = keras_builders(tf)
    names = sys.argv[1:] or list(builders)
    fails = []
    for n in names:
        try:
            if not probe(n, builders[n]):
                fails.append(n)
        except Exception as e:  # noqa: BLE001
            print(f"{n}: ERROR {type(e).__name__}: {e}")
            fails.append(n)
    print("fails:", fails or "none")


if __name__ == "__main__":
    main()
