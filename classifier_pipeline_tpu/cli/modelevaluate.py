"""modelevaluate CLI (reference src/modelevaluate.py): confusion matrices
over a records split, per-label threshold search, track-level evaluation
from metadata."""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np


def confusion_matrix(y_true, y_pred, n):
    cm = np.zeros((n, n), np.int64)
    for t, p in zip(y_true, y_pred):
        cm[t, p] += 1
    return cm


def print_confusion(cm, labels):
    width = max(len(l) for l in labels) + 1
    header = " " * width + " ".join(f"{l[:6]:>7}" for l in labels)
    print(header)
    for i, l in enumerate(labels):
        print(f"{l:<{width}}" + " ".join(f"{cm[i, j]:>7}" for j in range(len(labels))))


def best_threshold(scores, positives, steps=100):
    """Per-label threshold maximizing balanced accuracy (reference
    modelevaluate.best_threshold:1088-1177 sweeps thresholds to trade
    precision/recall)."""
    best_t, best_score = 0.5, -1.0
    for t in np.linspace(0.0, 1.0, steps + 1):
        preds = scores >= t
        tp = np.sum(preds & positives)
        tn = np.sum(~preds & ~positives)
        fp = np.sum(preds & ~positives)
        fn = np.sum(~preds & positives)
        sens = tp / (tp + fn) if tp + fn else 0
        spec = tn / (tn + fp) if tn + fp else 0
        bal = (sens + spec) / 2
        if bal > best_score:
            best_score, best_t = bal, float(t)
    return best_t, best_score


def evaluate_records(model_file, data_dir, split="test", batch_size=32):
    from classifier_pipeline_tpu.classify.interpreter import FlaxInterpreter
    from classifier_pipeline_tpu.data.loader import (
        augment_and_tile,
        build_label_arrays,
        load_split,
    )
    import jax

    interp = FlaxInterpreter(model_file)
    data = load_split(Path(data_dir) / split)
    if data is None:
        for alt in ("validation", "train"):
            data = load_split(Path(data_dir) / alt)
            if data is not None:
                logging.warning("split %s empty; evaluating %s", split, alt)
                break
    if data is None:
        raise SystemExit(f"no records under {data_dir}")
    meta = json.loads((Path(data_dir) / "training-meta.json").read_text())
    onehots = build_label_arrays(meta["labels"], interp.labels)
    y_true = []
    scores = []
    images = data["images"]
    for i in range(0, len(images), batch_size):
        batch = images[i : i + batch_size]
        tiled = augment_and_tile(
            jax.numpy.asarray(batch), jax.random.PRNGKey(0),
            square_width=interp.params.square_width, augment=False,
        )
        out = interp.predict(np.asarray(tiled))
        scores.append(out)
        y_true.extend(
            int(np.argmax(onehots[data["labels"][i + j]]))
            for j in range(len(batch))
        )
    scores = np.concatenate(scores)
    y_pred = list(np.argmax(scores, axis=1))
    cm = confusion_matrix(y_true, y_pred, len(interp.labels))
    acc = float(np.mean(np.array(y_true) == np.array(y_pred))) if y_true else 0
    thresholds = []
    y_true_arr = np.array(y_true)
    for li, label in enumerate(interp.labels):
        pos = y_true_arr == li
        if pos.sum() == 0:
            thresholds.append(0.8)
            continue
        t, _ = best_threshold(scores[:, li], pos)
        thresholds.append(round(t, 3))
    return cm, acc, thresholds, interp.labels


def main(argv=None):
    parser = argparse.ArgumentParser(description="evaluate a trained model")
    parser.add_argument("-m", "--model-file", required=True)
    parser.add_argument("-d", "--data-dir", default="training-data")
    parser.add_argument("--split", default="test")
    parser.add_argument("--write-thresholds", help="update model json with thresholds")
    parser.add_argument("--platform", choices=["tpu", "cpu", "default"], default="default")
    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from classifier_pipeline_tpu.utils.logs import init_logging

    init_logging()
    cm, acc, thresholds, labels = evaluate_records(
        args.model_file, args.data_dir, args.split
    )
    print_confusion(cm, labels)
    print(f"accuracy: {acc:.4f}")
    print(f"thresholds: {dict(zip(labels, thresholds))}")
    if args.write_thresholds:
        path = Path(args.write_thresholds)
        meta = json.loads(path.read_text())
        meta["thresholds"] = thresholds
        path.write_text(json.dumps(meta, indent=2))
        print(f"wrote thresholds to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
