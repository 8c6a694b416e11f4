"""Training/eval step functions (optax) for the classifier models.

Multi-label sigmoid BCE matching the reference's training objective
(reference kerasmodel.py loss/optimizer + model.fit; multi-label default).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class _KerasAdamState(NamedTuple):
    count: jax.Array
    lr: jax.Array  # mutable base lr (ReduceLROnPlateau: _replace(lr=...))
    mu: Any
    nu: Any


def keras_adam(learning_rate=0.001, b1=0.9, b2=0.999, eps=1e-7,
               decay_rate=None, decay_steps=100000):
    """tf.keras.optimizers.Adam's exact update rule.

    Differs from optax.adam in epsilon placement: keras folds the bias
    corrections into the step size (alpha = lr*sqrt(1-b2^t)/(1-b1^t)) and
    adds epsilon to the UNCORRECTED sqrt(v) — an effective first-step
    epsilon of eps/sqrt(1-b2) (~31.6x optax's), which visibly shrinks
    small-gradient updates. Verified one-step-equal to tf.keras in
    tests/test_train_oracle.py. decay_rate enables the reference's
    staircase ExponentialDecay schedule (kerasmodel.py optimizer():
    decay_steps=100000)."""

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        z2 = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _KerasAdamState(
            jnp.zeros([], jnp.int32), jnp.float32(learning_rate), z, z2
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (g - m) * (1 - b1), state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: v + (g * g - v) * (1 - b2), state.nu, updates
        )
        t = count.astype(jnp.float32)
        lr = state.lr
        if decay_rate is not None:
            # keras ExponentialDecay(staircase=True) evaluated at
            # optimizer.iterations (0-based at the first step)
            lr = lr * jnp.float32(decay_rate) ** jnp.floor(
                (t - 1) / decay_steps
            )
        alpha = lr * jnp.sqrt(1 - jnp.float32(b2) ** t) / (
            1 - jnp.float32(b1) ** t
        )
        upd = jax.tree_util.tree_map(
            lambda m, v: -alpha * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return upd, _KerasAdamState(count, state.lr, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate=0.001, learning_rate_decay=None):
    """The reference's training optimizer (kerasmodel.py:1233-1247):
    Adam with keras's exact epsilon placement + optional staircase decay."""
    return keras_adam(learning_rate, decay_rate=learning_rate_decay)


def create_train_state(model, rng, input_shape, tx) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )


def _smooth(labels, label_smoothing):
    if label_smoothing:
        return labels * (1 - label_smoothing) + 0.5 * label_smoothing
    return labels


def bce_loss(logits, labels, label_smoothing=0.0):
    return optax.sigmoid_binary_cross_entropy(
        logits, _smooth(labels, label_smoothing)
    ).mean()


def make_train_step(model, tx, multi_label=True, label_smoothing=0.0,
                    class_weights=None):
    """Returns step(state, batch, rng) -> (state, metrics). The model must be
    built with logits_only=True for a numerically stable loss.

    class_weights: optional (num_labels,) array (reference tfdataset.
    get_weighting via model.fit(class_weight=...)); each sample's loss is
    scaled by the weight of its primary (argmax) label, keras's class_weight
    semantics for one-hot targets."""
    if class_weights is not None:
        class_weights = jnp.asarray(class_weights, jnp.float32)

    def loss_fn(params, batch_stats, images, labels, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = model.apply(
            variables,
            images,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if multi_label:
            per = optax.sigmoid_binary_cross_entropy(
                logits, _smooth(labels, label_smoothing)
            ).mean(axis=-1)
        else:
            per = optax.softmax_cross_entropy(logits, labels)
        if class_weights is not None:
            per = per * class_weights[jnp.argmax(labels, axis=-1)]
        loss = per.mean()
        return loss, (mutated["batch_stats"], logits)

    def step(state: TrainState, images, labels, rng):
        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, labels, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        preds = (jax.nn.sigmoid(logits) > 0.5) if multi_label else (
            jnp.argmax(logits, -1)[:, None] == jnp.argmax(labels, -1)[:, None]
        )
        acc = jnp.mean((preds == (labels > 0.5)).astype(jnp.float32))
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            {"loss": loss, "binary_accuracy": acc},
        )

    return step


def make_eval_step(model, multi_label=True):
    def step(state: TrainState, images, labels):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = model.apply(variables, images, train=False)
        if multi_label:
            loss = bce_loss(logits, labels)
            acc = jnp.mean(
                ((jax.nn.sigmoid(logits) > 0.5) == (labels > 0.5)).astype(jnp.float32)
            )
        else:
            loss = optax.softmax_cross_entropy(logits, labels).mean()
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == jnp.argmax(labels, -1)).astype(jnp.float32)
            )
        return {"loss": loss, "binary_accuracy": acc}

    return step
