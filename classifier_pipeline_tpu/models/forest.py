"""False-positive gate model (reference src/ml_tools/forestmodel.py).

Per-frame statistical features (intensity-weighted moments, SNR, fill
factor) fed to a random forest that cheaply rejects false-positive tracks
before the CNN runs.

The reference unpickles an sklearn forest; our artifact is self-contained:
<model>.json metadata (same schema) + <model>.npz holding every tree's node
arrays (children/feature/threshold/leaf distributions). ``convert_sklearn``
turns an existing pickle into this format. Evaluation is pure NumPy (the
forest is tiny and branchy — a poor MXU fit by design; the CNN is the TPU
workload).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.classify.trackprediction import TrackPrediction

FEATURE_NAMES = [
    "sqrt_area", "elongation", "peak_snr", "mean_snr", "fill_factor",
    "thermal_max", "thermal_min", "thermal_std",
    "filtered_max", "filtered_min", "filtered_std",
]


def intensity_weighted_moments(sub, region_x, region_y):
    """reference forestmodel.py:723-762."""
    tot = np.sum(sub)
    if tot <= 0.0:
        sub = np.ones(sub.shape)
        tot = sub.size
    Y, X = np.mgrid[0 : sub.shape[0], 0 : sub.shape[1]]
    cx = np.sum(sub * X) / tot
    cy = np.sum(sub * Y) / tot
    Xc = X - cx
    Yc = Y - cy
    cent = np.array([region_x + cx, region_y + cy])
    mxx = np.sum(Xc * Xc * sub) / tot
    mxy = np.sum(Xc * Yc * sub) / tot
    myy = np.sum(Yc * Yc * sub) / tot
    w, v = np.linalg.eigh(np.array([[mxx, mxy], [mxy, myy]]))
    w = np.abs(w)
    if w[0] < w[1]:
        w = w[::-1]
        v = v[:, ::-1]
    extent = np.sqrt(w) + 0.5
    theta = np.arctan2(v[1, 0], v[0, 0])
    return cent, extent, theta


def frame_feature_vector(thermal_crop, filtered_crop, back_crop, back_med,
                         t_median, region_x, region_y):
    """Per-frame 11-dim feature vector (reference FrameFeatures.calculate)."""
    thermal = thermal_crop.astype(np.float64) + back_med - t_median
    filtered = np.abs(filtered_crop.astype(np.float64))
    cent, extent, _ = intensity_weighted_moments(filtered, region_x, region_y)
    area = np.pi * extent[0] * extent[1]
    sqrt_area = np.sqrt(area)
    elongation = extent[0] / extent[1]
    std_back = np.std(back_crop) + 1.0e-9
    return (
        np.array(
            [
                sqrt_area,
                elongation,
                (np.amax(thermal) - np.mean(back_crop)) / std_back,
                np.std(thermal) / std_back,
                np.sum(filtered) / area,
                np.amax(thermal),
                np.min(thermal),
                np.std(thermal),
                np.amax(filtered),
                np.amin(filtered),
                np.std(filtered),
            ]
        ),
        cent,
    )


def forest_features(thermal, filtered, background, regions, buf_len=1):
    """Features for a list of regions. thermal/filtered: (T,H,W); background
    (H,W). regions: RegionRow-likes. Returns (X, frames_used, masses)."""
    back_med = np.median(background)
    medians = {}
    feats = []
    frames_used = []
    masses = []
    for r in regions:
        if r.blank or r.width <= 0 or r.height <= 0:
            continue
        t = r.frame_number
        if t not in medians:
            medians[t] = np.median(thermal[t])
        th_c = thermal[t, r.y : r.bottom, r.x : r.right]
        fi_c = filtered[t, r.y : r.bottom, r.x : r.right]
        bk_c = background[r.y : r.bottom, r.x : r.right]
        vec, _ = frame_feature_vector(
            th_c, fi_c, bk_c, back_med, medians[t], r.x, r.y
        )
        feats.append(vec)
        frames_used.append(t)
        masses.append(r.mass)
    if not feats:
        return None, None, None
    return np.array(feats), frames_used, masses


def aggregate_track_features(per_frame: np.ndarray) -> np.ndarray:
    """Per-track MVM feature vector: [avg, std, max, min, diff] over each
    per-frame feature (the reference aggregates its per-frame stats the same
    way; forestmodel.py EXTRA=['avg','std','max','min','diff'])."""
    if per_frame is None or len(per_frame) == 0:
        return np.zeros(5 * len(FEATURE_NAMES), np.float32)
    pf = np.asarray(per_frame, np.float64)
    agg = np.concatenate(
        [pf.mean(0), pf.std(0), pf.max(0), pf.min(0), pf.max(0) - pf.min(0)]
    )
    return agg.astype(np.float32)


MVM_FEATURE_DIM = 5 * len(FEATURE_NAMES)


class Forest:
    """Array-form decision forest: predict_proba via per-tree traversal."""

    def __init__(self, trees, classes):
        self.trees = trees  # list of dicts with node arrays
        self.classes = list(classes)

    def predict_proba(self, X):
        X = np.asarray(X, np.float64)
        out = np.zeros((X.shape[0], len(self.classes)))
        for tree in self.trees:
            left = tree["children_left"]
            right = tree["children_right"]
            feat = tree["feature"]
            thresh = tree["threshold"]
            value = tree["value"]  # (nodes, classes) normalized
            for i, x in enumerate(X):
                node = 0
                while left[node] != -1:
                    node = left[node] if x[feat[node]] <= thresh[node] else right[node]
                out[i] += value[node]
        return out / len(self.trees)

    def save(self, path):
        arrs = {"classes": np.array(self.classes, dtype=object)}
        arrs["n_trees"] = np.array(len(self.trees))
        for i, t in enumerate(self.trees):
            for k, v in t.items():
                arrs[f"t{i}_{k}"] = v
        np.savez_compressed(path, **arrs, allow_pickle=True)

    @classmethod
    def load(cls, path):
        data = np.load(path, allow_pickle=True)
        n = int(data["n_trees"])
        trees = []
        for i in range(n):
            trees.append(
                {
                    k: data[f"t{i}_{k}"]
                    for k in ("children_left", "children_right", "feature",
                              "threshold", "value")
                }
            )
        return cls(trees, list(data["classes"]))

    @classmethod
    def convert_sklearn(cls, skl_forest):
        """Convert a fitted sklearn RandomForestClassifier."""
        trees = []
        for est in skl_forest.estimators_:
            t = est.tree_
            value = t.value.reshape(t.node_count, -1)
            value = value / np.maximum(value.sum(axis=1, keepdims=True), 1e-12)
            trees.append(
                {
                    "children_left": t.children_left.copy(),
                    "children_right": t.children_right.copy(),
                    "feature": t.feature.copy(),
                    "threshold": t.threshold.copy(),
                    "value": value,
                }
            )
        return cls(trees, list(skl_forest.classes_))


class ForestModel:
    """Interpreter-compatible FP gate (reference ForestModel)."""

    TYPE = "RandomForest"

    def __init__(self, model_file, load_model=True):
        self.model_file = Path(model_file)
        meta = json.load(open(self.model_file.with_suffix(".json")))
        self.labels = meta["labels"]
        self.params = meta.get("hyperparams", {})
        self.thresholds = meta.get("thresholds")
        self.buffer_length = self.params.get("buffer_length", 1)
        self.id = None
        self.port = None
        self.seed = None
        self.model = None
        if load_model:
            self.load_model()

    def load_model(self):
        npz = self.model_file.with_suffix(".npz")
        if npz.exists():
            self.model = Forest.load(npz)
        else:
            logging.warning("No forest at %s — FP gate returns uniform", npz)

    def shape(self):
        return 1, (1, len(FEATURE_NAMES))

    def predict(self, X):
        if self.model is None:
            return np.full((len(X), len(self.labels)), 1.0 / len(self.labels))
        return self.model.predict_proba(X)

    def predict_track(self, clip_ctx, track, predict_from_last=None,
                      max_frames=None, num_predictions=None,
                      last_frame_predicted=None, **_):
        """Per-frame feature predictions (reference forestmodel process_track
        + predict_track). Returns (frames, predictions, masses) or None."""
        bounds = track.bounds
        if last_frame_predicted is not None and bounds:
            last_track_frame = bounds[-1].frame_number
            take = last_track_frame - last_frame_predicted
            if take > 0:
                bounds = bounds[-take:]
        if predict_from_last is not None:
            bounds = bounds[-predict_from_last:]
        regions = [
            r for r in bounds
            if not r.blank and r.width > 0 and r.height > 0
            and clip_ctx.has_frame(r.frame_number)
        ]
        if not regions:
            return None
        if max_frames is not None and len(regions) > max_frames:
            idx = np.random.choice(len(regions), max_frames, replace=False)
            idx.sort()
            regions = [regions[i] for i in idx]
        thermal = np.asarray(clip_ctx.thermal)
        filtered = np.asarray(clip_ctx.filtered)
        background = clip_ctx.background
        if background is None:
            background = np.zeros(thermal.shape[1:], np.float32)
        remapped = [
            _RemappedRegion(r, clip_ctx.index_of(r.frame_number)) for r in regions
        ]
        X, frame_idx, masses = forest_features(thermal, filtered, background, remapped)
        if X is None:
            return None
        frames = [r.frame_number for r in regions]
        preds = self.predict(X)
        return frames, preds, masses

    def classify_track(self, clip_ctx, track, last_x_frames=None, min_segments=None,
                       segment_frames=None):
        result = self.predict_track(clip_ctx, track, predict_from_last=last_x_frames)
        if result is None:
            return None
        frames, preds, masses = result
        tp = TrackPrediction(track.track_id, self.labels)
        tp.classified_track(preds, frames, masses)
        return tp


class _RemappedRegion:
    """Region view with frame_number remapped to a context array index."""

    def __init__(self, region, idx):
        self._r = region
        self.frame_number = idx

    def __getattr__(self, name):
        return getattr(self._r, name)
