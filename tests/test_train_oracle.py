"""One-step training-numerics oracle vs tf.keras.

The reference trains with model.fit: Adam(lr), Binary/CategoricalCrossentropy
with label smoothing, per-sample class weights, BN running-stat updates
(reference ml_tools/kerasmodel.py:369-378 compile, :633-649 fit with
class_weight=get_weighting(...)). Inference parity is pinned end-to-end by
tests/test_keras_import.py + test_classify_golden.py; this file pins the
TRAINING half: weights imported from the committed .keras fixture into the
Flax twin, ONE optimizer step on the same batch on both sides, asserting

  * loss equal (rel 1e-5),
  * per-layer gradient norms equal (rel 2e-3 — f32 backward kernel-order
    noise through a depth-10 net),
  * per-layer updated-weight deltas equal elementwise (atol 5e-4/rel 2%,
    <=0.1% of coords may flip where the true gradient sits at the f32
    noise floor — update = lr*g/(|g|+eps_eff) flips with g there). The
    optimizer is steps.keras_adam: keras puts its epsilon on the
    UNCORRECTED sqrt(v) (effective first-step eps 31.6x optax.adam's) — a
    real semantic difference this oracle caught,
  * BN running-stat updates equal (rel 5e-4 — batch variance of
    noise-accumulated deep activations).

Dropout is neutralized on both sides (keras rates -> 0, flax Dropout
patched to identity) — the two frameworks cannot share dropout masks; every
other training-mode behavior (batch-stat BN, the loss, the optimizer) runs
exactly as in reference training. Multi-label targets include a
bird+land-bird multi-hot row (the reference's land-bird mapping,
kerasmodel.py:567-568) so the BCE covers multi-hot semantics.

Keras class_weight on 2D one-hot/multi-hot targets weights each sample by
its argmax class (keras sample-weight standardization); our
train.steps.make_train_step implements the same rule — asserted here
against keras's own fit-path (train_on_batch).
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"

LR = 0.001
LABEL_SMOOTHING = 0.1
CLASS_WEIGHTS = [1.0, 2.5, 0.5, 1.3, 1.0]


def _all_keras_layers(model):
    for layer in model.layers:
        if hasattr(layer, "layers"):
            yield from _all_keras_layers(layer)
        yield layer


@pytest.mark.oracle
def test_one_train_step_matches_keras():
    tf = pytest.importorskip("tensorflow")
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn
    from unittest import mock

    from classifier_pipeline_tpu.models.keras_import import (
        import_keras_weights,
    )
    from classifier_pipeline_tpu.models.registry import build_classifier
    from classifier_pipeline_tpu.train import steps

    meta = json.loads((FIXTURES / "classify_model.json").read_text())
    labels = meta["labels"]
    hp = meta["hyperparams"]
    n = len(labels)

    # ---- batch: preprocessed-domain images + multi-hot targets ----------
    rng = np.random.RandomState(11)
    B, S = 8, hp["frame_size"] * hp["square_width"]
    x_np = rng.uniform(0, 255, (B, S, S, 2)).astype(np.float32)
    y_np = np.zeros((B, n), np.float32)
    y_np[np.arange(B), rng.randint(0, n, B)] = 1.0
    # bird + land-bird style multi-hot rows (two positive classes)
    y_np[0, (y_np[0].argmax() + 1) % n] = 1.0
    y_np[3, (y_np[3].argmax() + 2) % n] = 1.0

    # ---- keras side: load fixture, zero dropout, one train_on_batch ----
    keras_model = tf.keras.models.load_model(
        str(FIXTURES / "classify_model.keras")
    )
    for layer in _all_keras_layers(keras_model):
        if isinstance(layer, tf.keras.layers.Dropout):
            layer.rate = 0.0
    keras_model.compile(
        optimizer=tf.keras.optimizers.Adam(learning_rate=LR),
        loss=tf.keras.losses.BinaryCrossentropy(
            label_smoothing=LABEL_SMOOTHING
        ),
    )
    before = {
        v.path if hasattr(v, "path") else v.name: np.array(v)
        for v in keras_model.weights
    }
    # gradients through the exact compiled loss + class_weight sample
    # weighting (keras standardizes class_weight to per-sample weights by
    # the argmax class for 2D targets)
    sw = tf.constant(
        np.asarray(CLASS_WEIGHTS, np.float32)[y_np.argmax(axis=1)]
    )
    loss_obj = tf.keras.losses.BinaryCrossentropy(
        label_smoothing=LABEL_SMOOTHING
    )
    with tf.GradientTape() as tape:
        probs = keras_model(x_np, training=True)
        tape_loss = loss_obj(y_np, probs, sample_weight=sw)
    kgrads = tape.gradient(tape_loss, keras_model.trainable_variables)
    kgrad_by_name = {
        (v.path if hasattr(v, "path") else v.name): np.array(g)
        for v, g in zip(keras_model.trainable_variables, kgrads)
    }
    # reload: the tape pass above already advanced the BN running stats
    keras_model = tf.keras.models.load_model(
        str(FIXTURES / "classify_model.keras")
    )
    for layer in _all_keras_layers(keras_model):
        if isinstance(layer, tf.keras.layers.Dropout):
            layer.rate = 0.0
    keras_model.compile(
        optimizer=tf.keras.optimizers.Adam(learning_rate=LR),
        loss=tf.keras.losses.BinaryCrossentropy(
            label_smoothing=LABEL_SMOOTHING
        ),
    )
    out = keras_model.train_on_batch(
        x_np, y_np, class_weight=dict(enumerate(CLASS_WEIGHTS)),
        return_dict=True,
    )
    kloss = float(out["loss"])
    after = {
        v.path if hasattr(v, "path") else v.name: np.array(v)
        for v in keras_model.weights
    }
    kdeltas = {k: after[k] - before[k] for k in before}

    # ---- flax side: imported weights, same batch, one optax step -------
    model = build_classifier(
        hp.get("model_name", "wr-resnet"), n, params=hp, dropout=0.0,
        multi_label=True, logits_only=True,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 2), jnp.float32),
        train=False,
    )
    variables = import_keras_weights(
        variables, FIXTURES / "classify_model.keras",
        flax_bn_eps=1e-3,  # wr-resnet twin uses the keras BN epsilon
    )
    tx = steps.keras_adam(LR)  # keras-exact Adam (epsilon placement)
    state = steps.TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )
    step = steps.make_train_step(
        model, tx, multi_label=True, label_smoothing=LABEL_SMOOTHING,
        class_weights=np.asarray(CLASS_WEIGHTS, np.float32),
    )
    # neutralize the hard-coded block dropout exactly like the keras side
    with mock.patch.object(
        nn.Dropout, "__call__", lambda self, x, *a, **kw: x
    ):
        # gradients for the norm comparison
        def loss_fn(params):
            logits, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                jnp.asarray(x_np), train=True, mutable=["batch_stats"],
            )
            per = optax.sigmoid_binary_cross_entropy(
                logits, steps._smooth(jnp.asarray(y_np), LABEL_SMOOTHING)
            ).mean(axis=-1)
            w = jnp.asarray(CLASS_WEIGHTS, jnp.float32)[
                jnp.argmax(jnp.asarray(y_np), axis=-1)
            ]
            return (per * w).mean()

        fgrads = jax.grad(loss_fn)(state.params)
        new_state, metrics = step(
            state, jnp.asarray(x_np), jnp.asarray(y_np),
            jax.random.PRNGKey(1),
        )
    floss = float(metrics["loss"])

    # ---- loss ----------------------------------------------------------
    assert kloss == pytest.approx(floss, rel=1e-5), (kloss, floss)

    # ---- align layers: walk both trees in import order -----------------
    from classifier_pipeline_tpu.models.keras_import import (
        _flax_entries,
        _keras_entries,
        _sort_kind,
        read_keras_layers,
    )

    from classifier_pipeline_tpu.models.keras_import import _to_mutable

    # NOTE: jax.tree_util.tree_map would SORT dict keys and scramble the
    # insertion order the importer pairs by — use its own _to_mutable
    kentries = _keras_entries(read_keras_layers(FIXTURES / "classify_model.keras"))
    fentries = _flax_entries(
        _to_mutable(state.params), _to_mutable(state.batch_stats)
    )

    def get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    by_kind_k = {"conv": [], "dense": [], "bn": []}
    by_kind_f = {"conv": [], "dense": [], "bn": []}
    for e in kentries:
        by_kind_k[e[0]].append(e)
    for kind, p in fentries:
        by_kind_f[kind].append(p)

    checked = 0
    for kind in ("conv", "dense", "bn"):
        ordered = _sort_kind(by_kind_k[kind])
        for e, path in zip(ordered, by_kind_f[kind]):
            kname = e[2]  # entry = (kind, cls, name, sub, tensors)
            for leaf, ksuffix in (
                ("kernel", "kernel"), ("bias", "bias"),
                ("scale", "gamma"),
            ):
                kvar = f"{kname}/{ksuffix}"
                if kind == "bn" and ksuffix == "bias":
                    kvar = f"{kname}/beta"
                if kvar not in kdeltas:
                    continue
                try:
                    fdelta = np.asarray(
                        get(new_state.params, path)[leaf]
                    ) - np.asarray(get(state.params, path)[leaf])
                    fgrad = np.asarray(get(fgrads, path)[leaf])
                except (KeyError, TypeError):
                    continue
                kdelta = kdeltas[kvar]
                kgrad = kgrad_by_name.get(kvar)
                if kind == "conv" and leaf == "kernel" and kgrad is not None:
                    pass  # shapes already match (same layout convention)
                assert fdelta.shape == kdelta.shape, (kvar, path)
                # f32 backward passes differ (oneDNN vs XLA kernel
                # orders); depth-10 accumulation leaves ~1e-3 relative.
                # Conv biases feeding straight into BN have analytically
                # ZERO gradient (BN subtracts the mean) — both sides read
                # pure float noise there, so tiny norms compare absolutely.
                kn, fn_ = np.linalg.norm(kgrad), np.linalg.norm(fgrad)
                if kn > 1e-5:
                    np.testing.assert_allclose(
                        fn_, kn, rtol=2e-3, err_msg=f"grad norm {kvar}"
                    )
                else:
                    assert fn_ <= 1e-5, f"grad norm {kvar}: {fn_} vs {kn}"
                # first-step Adam updates are ~ +-lr*sign(g); at
                # near-zero-gradient coordinates the update slope is
                # lr/eps_eff (~316 here), so f32 grad noise of ~2e-7
                # legitimately moves a delta by ~6e-5. Bound the vector
                # error tightly (1%) and individual coords loosely.
                # sign flips are possible at coordinates where the true
                # gradient is at the f32 noise floor (update = lr*g/(|g|+
                # eps_eff) flips with g) — allow 0.1% of coords outside
                # tolerance, never more than 2*lr apart
                viol = np.abs(fdelta - kdelta) > 5e-4 + 0.02 * np.abs(kdelta)
                assert viol.mean() <= 1e-3, (
                    f"weight delta {kvar}: {viol.sum()}/{viol.size} outside"
                )
                assert np.abs(fdelta - kdelta).max() <= 2 * LR + 1e-6, (
                    f"weight delta {kvar}: max {np.abs(fdelta-kdelta).max()}"
                )

                checked += 1
    assert checked >= 20, f"only {checked} weight tensors compared"

    # ---- BN running stats ---------------------------------------------
    bn_checked = 0
    ordered_bn = _sort_kind(by_kind_k["bn"])
    for e, path in zip(ordered_bn, by_kind_f["bn"]):
        kname = e[2]
        for leaf, ksuffix in (("mean", "moving_mean"), ("var", "moving_variance")):
            kvar = f"{kname}/{ksuffix}"
            if kvar not in after:
                continue
            fnew = np.asarray(get(new_state.batch_stats, path)[leaf])
            np.testing.assert_allclose(
                fnew, after[kvar], atol=2e-5, rtol=5e-4,
                err_msg=f"BN stat {kvar}",
            )
            bn_checked += 1
    assert bn_checked >= 4, f"only {bn_checked} BN stats compared"
