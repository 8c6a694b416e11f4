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


def model_score(cm, labels):
    """Single comparison number for a model (reference modelevaluate.py
    model_score:67-125): per-label accuracy weighted by label importance,
    penalizing bird confusion with other animals."""
    labels = list(labels)
    if "None" not in labels:
        labels = labels + ["None"]
    n = len(labels)
    cm = np.asarray(cm, np.float64)
    if cm.shape[0] < n:
        cm = np.pad(cm, ((0, n - cm.shape[0]), (0, n - cm.shape[1])))
    row_sums = cm.sum(axis=1, keepdims=True)
    # out= matters: where= without out leaves zero-count rows uninitialized
    norm = np.around(
        np.divide(cm, row_sums, out=np.zeros_like(cm), where=row_sums > 0), 2
    )
    fp_i = labels.index("false-positive") if "false-positive" in labels else None
    none_i = labels.index("None") if "None" in labels else None
    unid_i = labels.index("unidentified") if "unidentified" in labels else None
    total, counted = 0.0, 0
    for li, label in enumerate(labels):
        acc = norm[li, li]
        fp_acc = norm[li, fp_i] if fp_i is not None else 0
        none_acc = norm[li, none_i] if none_i is not None else 0
        unid_acc = norm[li, unid_i] if unid_i is not None else 0
        other = 1 - (fp_acc + none_acc + unid_acc + acc)
        if norm[li].sum() == 0:
            other = 0
        if label == "bird":
            score = acc * 1.2 - other
        elif label in ("vehicle", "wallaby"):
            score = acc * 0.8
        elif label in ("mustelid", "human"):
            score = acc * 0.9
        elif label in ("None", "unidentified"):
            continue
        else:
            score = acc
        total += score
        counted += 1
    return round(total / counted, 3) if counted else 0.0


# metadata tag normalization (reference modelevaluate.py:318-321, 405-406)
_REMAP = {"rat": "rodent", "mouse": "rodent", "bird/kiwi": "kiwi",
          "land-bird": "bird"}


def _human_tag(track_meta):
    tags = track_meta.get("tags", [])
    human = {t.get("what") for t in tags if t.get("automatic") is False}
    if len(human) != 1:
        return None
    tag = human.pop()
    return _REMAP.get(tag, tag)


def _master_ai_tag(track_meta):
    for t in track_meta.get("tags", []):
        if t.get("automatic") is not True:
            continue
        data = t.get("model", t.get("data", {}))
        if (isinstance(data, str) and data == "Master") or (
            isinstance(data, dict) and data.get("name", "Master") == "Master"
        ):
            return _REMAP.get(t["what"], t["what"])
    return None


def _tally(y_true, y_pred):
    labels = sorted({*y_true, *y_pred} - {"None"}) + ["None"]
    idx = {l: i for i, l in enumerate(labels)}
    cm = confusion_matrix(
        [idx[t] for t in y_true], [idx[p] for p in y_pred], len(labels)
    )
    acc = (
        float(np.mean(np.array(y_true) == np.array(y_pred))) if y_true else 0.0
    )
    return cm, acc, labels


def metadata_confusion(dir_path):
    """Track-level confusion from already-classified sidecar metadata
    (reference metadata_confusion:270-430): human tag vs the master model's
    automatic tag, with rodent/kiwi/land-bird remapping."""
    y_true, y_pred = [], []
    for meta_f in sorted(Path(dir_path).glob("**/*.txt")):
        try:
            meta = json.loads(meta_f.read_text())
        except (json.JSONDecodeError, OSError):
            logging.error("couldn't load %s", meta_f)
            continue
        tracks = meta.get("Tracks") or meta.get("tracks") or []
        for track in tracks:
            human = _human_tag(track)
            if human is None:
                continue
            y_true.append(human)
            # our classify output: predictions list; reference uploads: tags
            preds = track.get("predictions")
            if preds:
                tag = preds[0].get("tag")
                y_pred.append(_REMAP.get(tag, tag) if tag else "None")
            else:
                y_pred.append(_master_ai_tag(track) or "None")
    return _tally(y_true, y_pred)


def evaluate_dir(model_file, dir_path, threshold=0.5):
    """Re-classify every CPTV under dir_path with THIS framework (batched
    device pipeline) and compare against the sidecars' human tags
    (reference evaluate_dir:592-847, Pool-of-8 → one vmapped device batch)."""
    from classifier_pipeline_tpu.config.config import Config, ModelConfig
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier

    dir_path = Path(dir_path)
    files = []
    truths = []
    for cptv in sorted(dir_path.glob("**/*.cptv")):
        meta_f = cptv.with_suffix(".txt")
        if not meta_f.exists():
            continue
        try:
            meta = json.loads(meta_f.read_text())
        except (json.JSONDecodeError, OSError):
            continue
        tracks = meta.get("Tracks") or meta.get("tracks") or []
        tagged = [
            (t, _human_tag(t)) for t in tracks if _human_tag(t) is not None
        ]
        if tagged:
            files.append(cptv)
            truths.append(tagged)
    if not files:
        raise SystemExit(f"no human-tagged CPTV files under {dir_path}")
    model = ModelConfig(id=1, name="eval", model_file=str(model_file))
    classifier = ClipClassifier(Config({}), model=model)
    metas = classifier.process_batch(files)
    y_true, y_pred = [], []
    for meta, tagged in zip(metas, truths):
        # re-extracted tracks need not agree with the sidecar's in count or
        # order: match each tagged sidecar track to the closest fresh track
        # by start frame + first-box centre distance (the tracking-tests
        # matcher's criterion), greedily, unmatched -> skipped
        fresh = list(meta["tracks"])
        used = set()
        for t_meta, tag in tagged:
            best_i, best_cost = None, None
            s_pos = (t_meta.get("positions") or [None])[0]
            s_start = t_meta.get("frame_start", t_meta.get("start_frame", 0))
            for i, ft in enumerate(fresh):
                if i in used:
                    continue
                f_pos = (ft.get("positions") or [None])[0]
                f_start = ft.get("frame_start", 0)
                cost = abs(int(f_start) - int(s_start)) * 2.0
                if s_pos and f_pos:
                    sx = s_pos["x"] + s_pos["width"] / 2
                    sy = s_pos["y"] + s_pos["height"] / 2
                    fx = f_pos["x"] + f_pos["width"] / 2
                    fy = f_pos["y"] + f_pos["height"] / 2
                    cost += ((sx - fx) ** 2 + (sy - fy) ** 2) ** 0.5
                if best_cost is None or cost < best_cost:
                    best_i, best_cost = i, cost
            if best_i is None or best_cost > 100:
                y_true.append(tag)
                y_pred.append("None")  # tagged animal not re-found
                continue
            used.add(best_i)
            y_true.append(tag)
            preds = fresh[best_i].get("predictions") or []
            if preds and preds[0].get("confidence", 0) >= threshold:
                ptag = preds[0].get("tag") or "None"
            else:
                ptag = "None"
            y_pred.append(_REMAP.get(ptag, ptag))
    return _tally(y_true, y_pred)


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


def _emit_confusion(cm, labels, confusion_file):
    print_confusion(cm, labels)
    if confusion_file:
        from classifier_pipeline_tpu.utils.visualise import (
            plot_confusion_matrix,
        )

        plot_confusion_matrix(cm, labels, confusion_file)
        print(f"wrote confusion plot to {confusion_file}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="evaluate a trained model")
    parser.add_argument("-m", "--model-file")
    parser.add_argument("-d", "--data-dir", default="training-data")
    parser.add_argument("--split", default="test")
    parser.add_argument("--write-thresholds", help="update model json with thresholds")
    parser.add_argument(
        "--metadata-dir",
        help="track-level confusion from existing classified sidecars",
    )
    parser.add_argument(
        "--evaluate-dir",
        help="re-classify CPTV files under this dir and score vs human tags",
    )
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument(
        "--confusion-file",
        help="write the confusion matrix as a PNG (reference --confusion)",
    )
    parser.add_argument("--platform", choices=["tpu", "cpu", "default"], default="default")
    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    if args.metadata_dir:
        cm, acc, labels = metadata_confusion(args.metadata_dir)
        _emit_confusion(cm, labels, args.confusion_file)
        print(f"track accuracy: {acc:.4f}")
        print(f"model score: {model_score(cm, labels)}")
        return 0
    if args.evaluate_dir:
        if not args.model_file:
            parser.error("--evaluate-dir requires -m/--model-file")
        cm, acc, labels = evaluate_dir(
            args.model_file, args.evaluate_dir, threshold=args.threshold
        )
        _emit_confusion(cm, labels, args.confusion_file)
        print(f"track accuracy: {acc:.4f}")
        print(f"model score: {model_score(cm, labels)}")
        return 0
    if not args.model_file:
        parser.error("-m/--model-file is required")
    cm, acc, thresholds, labels = evaluate_records(
        args.model_file, args.data_dir, args.split
    )
    _emit_confusion(cm, labels, args.confusion_file)
    print(f"accuracy: {acc:.4f}")
    print(f"model score: {model_score(cm, labels)}")
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
