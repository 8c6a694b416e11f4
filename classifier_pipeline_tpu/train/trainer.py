"""Training orchestration (reference src/ml_tools/kerasmodel.py train_model +
src/train/train.py).

Flax/optax loop with the reference's training regime: multi-label sigmoid
BCE, four checkpoints (latest, best val_loss, best val_acc, best
val_recall), EarlyStopping(patience=22), ReduceLROnPlateau, model metadata
JSON saved alongside weights.
"""

from __future__ import annotations

import functools
import json
import logging
import time
from pathlib import Path

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from classifier_pipeline_tpu.data.loader import (
    TrainLoader,
    build_label_arrays,
    load_split,
)
from classifier_pipeline_tpu.models.registry import build_classifier
from classifier_pipeline_tpu.train import steps

EARLY_STOP_PATIENCE = 22
REDUCE_LR_PATIENCE = 10
REDUCE_LR_FACTOR = 0.5


class Trainer:
    def __init__(self, run_name, data_dir, out_dir, model_name="wr-resnet",
                 hyperparams=None, seed=0, weights=None, fine_tune=False):
        self.run_name = run_name
        self.data_dir = Path(data_dir)
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.hp = {"model_name": model_name}
        self.hp.update(hyperparams or {})
        self.seed = seed
        self.weights = weights  # msgpack to resume/fine-tune from
        self.fine_tune = fine_tune  # reinit the prediction head
        meta = json.loads((self.data_dir / "training-meta.json").read_text())
        self.source_labels = meta["labels"]
        self.labels = list(meta["labels"])
        self.multi_label = self.hp.get("multi_label", True)
        if self.multi_label and "land-bird" not in self.labels:
            self.labels.append("land-bird")
        self.history = {"loss": [], "val_loss": [], "val_acc": [], "val_recall": []}

    def train(self, epochs=10, batch_size=32, learning_rate=1e-3):
        t0 = time.time()
        train_split = load_split(self.data_dir / "train")
        val_split = load_split(self.data_dir / "validation")
        if train_split is None:
            # tiny corpora can land everything in validation; fall back so the
            # loop still runs (reference relies on large corpora)
            logging.warning("empty train split — training on validation split")
            train_split = val_split
        if val_split is None:
            val_split = train_split
        if train_split is None:
            raise ValueError(f"no training data under {self.data_dir}")

        onehot_lookup = build_label_arrays(
            self.source_labels, self.labels, self.multi_label
        )
        train_onehots = onehot_lookup[train_split["labels"]]
        val_onehots = onehot_lookup[val_split["labels"]]

        model = build_classifier(
            self.hp["model_name"], len(self.labels), params=self.hp,
            dense_sizes=self.hp.get("dense_sizes"),
            dropout=self.hp.get("dropout", 0.3),
            multi_label=self.multi_label, logits_only=True,
            compute_dtype=jnp.bfloat16
            if self.hp.get("mixed_precision")
            else jnp.float32,
        )
        lr = learning_rate
        # keras-exact Adam (epsilon on the uncorrected sqrt(v), reference
        # kerasmodel.py optimizer(); one-step-equal to tf.keras in
        # tests/test_train_oracle.py), with the reference's optional
        # staircase ExponentialDecay
        tx = steps.keras_adam(
            lr, decay_rate=self.hp.get("learning_rate_decay")
        )
        sw = self.hp.get("square_width", 5)
        size = self.hp.get("frame_size", 32) * sw
        state = steps.create_train_state(
            model, jax.random.PRNGKey(self.seed), (1, size, size, 2), tx
        )
        if self.weights:
            # resume / fine-tune (reference kerasmodel --weights +
            # adjust_final_layer:380-431)
            loaded = flax.serialization.from_bytes(
                {"params": state.params, "batch_stats": state.batch_stats},
                Path(self.weights).read_bytes(),
            )
            params = loaded["params"]
            if self.fine_tune:
                params = dict(params)
                params["prediction"] = state.params["prediction"]
                logging.info("fine-tune: reinitialized prediction head")
            state = steps.TrainState(
                params=params,
                batch_stats=loaded.get("batch_stats", state.batch_stats),
                opt_state=tx.init(params),
                step=state.step,
            )
            logging.info("loaded weights from %s", self.weights)
        class_weights = None
        if self.hp.get("rebalance"):
            # reference tfdataset.get_weighting (:11-32): inverse-frequency
            # weights over the train distribution, capped to [0.25, 4]
            dist = train_onehots.sum(axis=0).astype(np.float64)
            non_zero = max(int((dist > 0).sum()), 1)
            total = dist.sum()
            class_weights = np.where(
                dist > 0,
                np.clip((1.0 / np.maximum(dist, 1e-9)) * (total / non_zero),
                        0.25, 4.0),
                0.0,
            ).astype(np.float32)
            logging.info("class weights: %s",
                         dict(zip(self.labels, class_weights.round(3))))
        # donate the state: params/opt buffers are updated in place on
        # device instead of allocating a fresh copy every step
        train_step = jax.jit(
            steps.make_train_step(
                model, tx, self.multi_label, class_weights=class_weights
            ),
            donate_argnums=(0,),
        )
        eval_step = jax.jit(steps.make_eval_step(model, self.multi_label))

        loader = TrainLoader(
            train_split, train_onehots, batch_size=batch_size,
            square_width=sw, seed=self.seed,
        )
        val_loader = TrainLoader(
            val_split, val_onehots, batch_size=batch_size, augment=False,
            square_width=sw, seed=self.seed + 1,
        )
        rng = jax.random.PRNGKey(self.seed + 2)
        best = {"val_loss": np.inf, "val_acc": -np.inf, "val_recall": -np.inf}
        epochs_no_improve = 0
        lr_no_improve = 0
        for epoch in range(epochs):
            losses = []
            for images, labels in loader.epoch():
                rng, sub = jax.random.split(rng)
                state, metrics = train_step(state, images, labels, sub)
                # keep the device scalar: fetching here would sync every step
                losses.append(metrics["loss"])
            losses = [float(x) for x in jax.device_get(losses)] or [np.nan]
            val = self.evaluate(eval_step, state, val_loader)
            self.history["loss"].append(float(np.mean(losses)))
            self.history["val_loss"].append(val["loss"])
            self.history["val_acc"].append(val["binary_accuracy"])
            self.history["val_recall"].append(val["recall"])
            logging.info(
                "epoch %d loss %.4f val_loss %.4f val_acc %.4f val_recall %.4f",
                epoch, np.mean(losses), val["loss"], val["binary_accuracy"],
                val["recall"],
            )
            self.save_checkpoint(state, "cp")
            improved = False
            if val["loss"] < best["val_loss"]:
                best["val_loss"] = val["loss"]
                self.save_checkpoint(state, "val_loss")
                improved = True
            if val["binary_accuracy"] > best["val_acc"]:
                best["val_acc"] = val["binary_accuracy"]
                self.save_checkpoint(state, "val_acc")
            if val["recall"] > best["val_recall"]:
                best["val_recall"] = val["recall"]
                self.save_checkpoint(state, "val_recall")
            if improved:
                epochs_no_improve = 0
                lr_no_improve = 0
            else:
                epochs_no_improve += 1
                lr_no_improve += 1
                if lr_no_improve >= REDUCE_LR_PATIENCE:
                    lr *= REDUCE_LR_FACTOR
                    state = state._replace(opt_state=state.opt_state._replace(
                        lr=jnp.float32(lr)))
                    lr_no_improve = 0
                    logging.info("ReduceLROnPlateau: lr -> %s", lr)
                if epochs_no_improve >= EARLY_STOP_PATIENCE:
                    logging.info("Early stopping at epoch %d", epoch)
                    break
        self.save_model(state)
        logging.info("Training done in %.1fs", time.time() - t0)
        return state

    def evaluate(self, eval_step, state, loader):
        losses, accs = [], []
        for images, labels in loader.epoch():
            m = eval_step(state, images, labels)
            losses.append(float(m["loss"]))
            accs.append(float(m["binary_accuracy"]))
        recall = self._recall(state, loader)
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "binary_accuracy": float(np.mean(accs)) if accs else float("nan"),
            "recall": recall,
        }

    def _recall(self, state, loader):
        tp = 0
        pos = 0
        for images, labels in loader.epoch():
            logits = self._apply(state, images)
            preds = jax.nn.sigmoid(logits) > 0.5
            labels = np.asarray(labels) > 0.5
            preds = np.asarray(preds)
            tp += int(np.sum(preds & labels))
            pos += int(np.sum(labels))
        return tp / pos if pos else 0.0

    def _apply(self, state, images):
        if not hasattr(self, "_apply_jit"):
            model = build_classifier(
                self.hp["model_name"], len(self.labels), params=self.hp,
                dense_sizes=self.hp.get("dense_sizes"),
                dropout=self.hp.get("dropout", 0.3),
                multi_label=self.multi_label, logits_only=True,
            )
            self._apply_jit = jax.jit(
                lambda v, x: model.apply(v, x, train=False)
            )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return self._apply_jit(variables, images)

    def save_checkpoint(self, state, name):
        ckpt_dir = self.out_dir / name
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        (ckpt_dir / "model.msgpack").write_bytes(
            flax.serialization.to_bytes(variables)
        )
        self._write_metadata(ckpt_dir / "model.json")

    def save_model(self, state):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        prefix = self.out_dir / self.run_name
        prefix.with_suffix(".msgpack").write_bytes(
            flax.serialization.to_bytes(variables)
        )
        self._write_metadata(prefix.with_suffix(".json"))
        logging.info("Saved model to %s", prefix)

    @staticmethod
    def benchmark(model_name="wr-resnet", batch_size=128, n_steps=50,
                  hyperparams=None, mixed_precision=True, num_labels=17):
        """Training-throughput benchmark on synthetic data: returns
        steps/sec and images/sec for the jitted, state-donated train step
        (bf16 compute by default — the idiomatic TPU regime)."""
        hp = dict(hyperparams or {})
        model = build_classifier(
            model_name, num_labels, params=hp,
            dense_sizes=hp.get("dense_sizes"),
            dropout=hp.get("dropout", 0.3), logits_only=True,
            compute_dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
        )
        tx = steps.keras_adam(1e-3)
        sw = hp.get("square_width", 5)
        size = hp.get("frame_size", 32) * sw
        state = steps.create_train_state(
            model, jax.random.PRNGKey(0), (1, size, size, 2), tx
        )
        step = steps.make_train_step(model, tx)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(0, 255, (batch_size, size, size, 2)).astype(np.float32)
        )
        labels = jnp.asarray(
            (rng.uniform(0, 1, (batch_size, num_labels)) > 0.8).astype(
                np.float32
            )
        )
        key = jax.random.PRNGKey(1)
        # run n_steps inside ONE device program (lax.scan over steps): a
        # remote TPU charges dispatch latency per call, which would swamp
        # the per-step compute of these small models
        def scan_body(st, i):
            new_st, m = step(st, images, labels, jax.random.fold_in(key, i))
            return new_st, m["loss"]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(st):
            return jax.lax.scan(scan_body, st, jnp.arange(n_steps))

        state, losses = run(state)  # compile
        float(losses[-1])
        t0 = time.time()
        state, losses = run(state)
        loss = float(losses[-1])  # forces completion of the whole chain
        dt = time.time() - t0
        return {
            "steps_per_sec": n_steps / dt,
            "images_per_sec": n_steps * batch_size / dt,
            "loss": loss,
        }

    def _write_metadata(self, path):
        meta = {
            "name": self.run_name,
            "labels": self.labels,
            "type": "thermal",
            "hyperparams": self.hp,
            "history": self.history,
        }
        Path(path).write_text(json.dumps(meta, indent=2, default=float))
