"""False-positive gate model (reference src/ml_tools/forestmodel.py).

Per-frame statistical features fed to a random forest that cheaply rejects
false-positive tracks before the CNN runs, plus the 188-dim per-track
"movement" (MVM) feature vector consumed by the CNN's feature branch
(reference kerasmodel.py:310 `Input((188))`, thermaldataset.py:258
`36*5+8` floats per record).

Feature schema (reference forestmodel.py:10-47 FEAT_LABELS):
  * 36 per-frame features: 5 shape/SNR features, 12 movement features
    (displacement vs the frame 1/3/5 steps back, absolute and relative to
    sqrt(area), split by axis), 18 speed statistics (max/min/avg over the
    5-deep speed buffers, absolute/x/y and their relative forms), and
    hist_diff (60-bin histogram correlation of the region crop vs the
    background crop, forestmodel.py:676-719).
  * Aggregated per track as [avg, std, max, min, diff(=max-min)] x 36 = 180
    (forestmodel.py:60-65 EXTRA, :361-425), plus 7 burst features
    (:443-504) and the total frame count -> 188.
  * `normalize_features` applies the featurenorms mean/std tables
    (forestmodel.py:106-111; featurenorms.py). The tables are 181-dim —
    they cover the 180 aggregates plus the trailing frame count, i.e. the
    pre-burst layout — so the 7 burst dims pass through unnormalized.

The reference head is mid-refactor here: `FrameFeatures.features()` returns
only the 11 shape/SNR/intensity features (movement block commented out,
forestmodel.py:564-580) while the aggregation path divides by a 36-long
sample-count array (:383-422) and the TFRecord reader expects 188 floats
(thermaldataset.py:258-260). This module implements the coherent 36/188
schema those consumers define; the 11-dim per-frame path (buf_len=1) is kept
for the FP gate itself, which runs with buffer_length=1 at head
(forestmodel.py:119 `params.get("buffer_length", 1)`).

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

# The 11 instantaneous features (reference FrameFeatures.features(),
# forestmodel.py:564-580) — the per-frame FP-gate input at buffer_length=1.
BASE_FEATURE_NAMES = [
    "sqrt_area", "elongation", "peak_snr", "mean_snr", "fill_factor",
    "thermal_max", "thermal_min", "thermal_std",
    "filtered_max", "filtered_min", "filtered_std",
]
# Backwards-compatible alias (earlier rounds exported FEATURE_NAMES).
FEATURE_NAMES = BASE_FEATURE_NAMES

# The 36 per-frame features of the movement schema
# (reference forestmodel.py:10-47).
FEAT_LABELS = [
    "sqrt_area", "elongation", "peak_snr", "mean_snr", "fill_factor",
    "move_1", "rel_move_1", "rel_x_move_1", "rel_y_move_1",
    "move_3", "rel_move_3", "rel_x_move_3", "rel_y_move_3",
    "move_5", "rel_move_5", "rel_x_move_5", "rel_y_move_5",
    "max_speed", "min_speed", "avg_speed",
    "max_speed_x", "min_speed_x", "avg_speed_x",
    "max_speed_y", "min_speed_y", "avg_speed_y",
    "max_rel_speed", "min_rel_speed", "avg_rel_speed",
    "max_rel_speed_x", "min_rel_speed_x", "avg_rel_speed_x",
    "max_rel_speed_y", "min_rel_speed_y", "avg_rel_speed_y",
    "hist_diff",
]

EXTRA = ["avg", "std", "max", "min", "diff"]
ALL_FEATURES = [f"{extra}-{f}" for extra in EXTRA for f in FEAT_LABELS]

BURST_FEATURE_NAMES = [
    "speed_distance_ratio", "speed_ratio", "burst_min", "burst_max",
    "burst_mean", "burst_chance", "burst_per_frame",
]

# 180 aggregates + 7 burst features + total frame count
# (reference forestmodel.py:428-438 hstack; thermaldataset.py:258 36*5+8).
MVM_FEATURE_DIM = len(ALL_FEATURES) + len(BURST_FEATURE_NAMES) + 1

# Per-feature lag corrections for the avg/std divisors: move_1 features have
# one fewer sample than frames, move_3 three fewer, move_5 five fewer
# (reference forestmodel.py:383-422).
_LAG = np.array([0] * 5 + [1] * 4 + [3] * 4 + [5] * 4 + [0] * 19)


def feature_mask(features_used):
    """Indices of named aggregate features (reference forestmodel.py:98-103)."""
    return np.array([ALL_FEATURES.index(f) for f in features_used])


def normalize_features(X):
    """Standardize a 188-dim track vector with the featurenorms tables
    (reference forestmodel.py:106-111).

    The tables cover the 180 [avg,std,max,min,diff] aggregates plus the
    trailing total-frames count (181 dims — the pre-burst layout); the 7
    burst dims (X[180:187]) postdate them and pass through unchanged.
    """
    from classifier_pipeline_tpu.models.featurenorms import MEAN_V, STD_V

    X = np.array(X, np.float32)
    X[..., :180] = (X[..., :180] - MEAN_V[:180]) / STD_V[:180]
    X[..., -1] = (X[..., -1] - MEAN_V[180]) / STD_V[180]
    return X


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


def _hist_60(img):
    """cv2.calcHist([img], [0], None, [60], [0, 255]) on a float32 image:
    uniform bins over [0, 255); values at/above the upper bound fall outside
    and are not counted (reference forestmodel.py:695-702)."""
    v = np.asarray(img, np.float32).ravel()
    idx = np.floor(v * np.float32(60.0 / 255.0)).astype(np.int64)
    ok = (idx >= 0) & (idx < 60)
    return np.bincount(idx[ok], minlength=60).astype(np.float32)


def _norm_minmax(h):
    """cv2.normalize(..., alpha=0, beta=1, NORM_MINMAX) on a float32 hist:
    double-precision scale/shift, result stored back as float32; flat
    input -> 0."""
    mn = float(h.min())
    mx = float(h.max())
    scale = 1.0 / (mx - mn) if (mx - mn) > np.finfo(np.float64).eps else 0.0
    shift = 0.0 - mn * scale
    # convertTo rounds scale/shift to float32, multiply-adds in double, and
    # stores float32 (hence e.g. -7.45e-9 instead of 0 at the min bin)
    scale = np.float64(np.float32(scale))
    shift = np.float64(np.float32(shift))
    return np.float32(np.float64(h) * scale + shift)


def _correl(h1, h2):
    """cv2.compareHist(..., HISTCMP_CORREL): sequential per-element double
    accumulation and the 1/total `scale` form, bit-matching OpenCV."""
    n = h1.size
    s1 = s2 = s11 = s22 = s12 = 0.0
    for a32, b32 in zip(h1.ravel(), h2.ravel()):
        a = float(a32)
        b = float(b32)
        s12 += a * b
        s1 += a
        s11 += a * a
        s2 += b
        s22 += b * b
    scale = 1.0 / n
    num = s12 - s1 * s2 * scale
    denom2 = (s11 - s1 * s1 * scale) * (s22 - s2 * s2 * scale)
    if abs(denom2) <= np.finfo(np.float64).eps:
        return 1.0
    return num / np.sqrt(denom2)


def hist_diff(back_crop, thermal_crop, normalize=True):
    """Histogram correlation of the region thermal crop vs the background
    crop (reference FrameFeatures.calc_histogram, forestmodel.py:676-719).

    ``normalize`` min-max scales both crops to 0..255 first; the scaling is
    shift-invariant, so applying it to the median-adjusted thermal equals
    the reference's raw-crop call. Every live reference call site passes
    normalize=True (interpreter.py:443-445, thermalwriter.py:310-317).
    """
    a = np.float32(back_crop)
    b = np.float32(thermal_crop)
    if normalize:
        # FLAT crops (max == min) normalize to all-NaN in the reference;
        # cv2.calcHist bins those NaNs exactly like 0.0 (verified against
        # the cv2 oracle in tests — NOT skipped), which nan_to_num matches.
        with np.errstate(divide="ignore", invalid="ignore"):
            a = (a - a.min()) / (a.max() - a.min()) * 255.0
            b = (b - b.min()) / (b.max() - b.min()) * 255.0
        a = np.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        b = np.nan_to_num(b, nan=0.0, posinf=0.0, neginf=0.0)
    return _correl(_norm_minmax(_hist_60(a)), _norm_minmax(_hist_60(b)))


def frame_feature_vector(thermal_crop, filtered_crop, back_crop, back_med,
                         t_median, region_x, region_y):
    """Per-frame 11-dim feature vector (reference FrameFeatures.calculate +
    features(), forestmodel.py:537-580). Returns (vec, centroid).

    Inputs are cast to float32 to match the reference's Frame.float_arrays
    dtype — the arithmetic below then promotes exactly as the reference's
    does, keeping results bit-identical."""
    thermal = np.float32(thermal_crop) + back_med - t_median
    filtered = np.abs(np.float32(filtered_crop))
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


def _nonzero_stats(buf):
    """max/min/mean over the positive entries of a speed buffer, 0 if none
    (reference forestmodel.py:581-633, the commented 36-feature block)."""
    nz = buf[buf > 0]
    if nz.size == 0:
        return 0.0, 0.0, 0.0
    return float(np.amax(nz)), float(np.amin(nz)), float(np.mean(nz))


class _FrameRecord:
    """Speed buffers + centroid for one valid frame of a track.

    Buffers are always 5 deep regardless of the configured buffer_length —
    the reference's FrameFeatures allocates buff_len=5 unconditionally
    (forestmodel.py:521-535), so _movement_vector's [2]/[4] lag reads see
    zeros, not an IndexError, when fewer lags are filled."""

    __slots__ = ("cent", "speed", "speed_x", "speed_y",
                 "rel_speed", "rel_speed_x", "rel_speed_y")

    def __init__(self, cent, buf_len):
        n = max(buf_len, 5)
        self.cent = cent
        self.speed = np.zeros(n)
        self.speed_x = np.zeros(n)
        self.speed_y = np.zeros(n)
        self.rel_speed = np.zeros(n)
        self.rel_speed_x = np.zeros(n)
        self.rel_speed_y = np.zeros(n)


def _movement_vector(base11, rec, hdiff):
    """Assemble the 36-dim per-frame vector in FEAT_LABELS order
    (reference forestmodel.py:635-674)."""
    v = np.empty(36)
    v[0:5] = base11[:5]
    v[5:9] = (rec.speed[0], rec.rel_speed[0], rec.rel_speed_x[0],
              rec.rel_speed_y[0])
    v[9:13] = (rec.speed[2], rec.rel_speed[2], rec.rel_speed_x[2],
               rec.rel_speed_y[2])
    v[13:17] = (rec.speed[4], rec.rel_speed[4], rec.rel_speed_x[4],
                rec.rel_speed_y[4])
    v[17:20] = _nonzero_stats(rec.speed)
    v[20:23] = _nonzero_stats(rec.speed_x)
    v[23:26] = _nonzero_stats(rec.speed_y)
    v[26:29] = _nonzero_stats(rec.rel_speed)
    v[29:32] = _nonzero_stats(rec.rel_speed_x)
    v[32:35] = _nonzero_stats(rec.rel_speed_y)
    v[35] = hdiff
    return v


def _burst_features(records, mean_speed):
    """The 7 burst features (reference forestmodel.py:443-504)."""
    cut_off = max(2, 1 + mean_speed)
    speeds = [float(r.speed[0]) for r in records]
    speed_above = sum(1 for s in speeds if s > cut_off)
    speed_below = sum(1 for s in speeds if s <= cut_off)

    burst_frames = 0
    burst_ratio = []
    burst_history = []
    total_burst_frames = 0
    low_speed_distance = 0.0
    high_speed_distance = 0.0
    for i, s in enumerate(speeds):
        if s < cut_off:
            low_speed_distance += s
        else:
            high_speed_distance += s
        if i > 0:
            if speeds[i - 1] > cut_off and s > cut_off:
                burst_frames += 1
            elif burst_frames > 0:
                burst_start = i - burst_frames - 1
                if burst_history:
                    prev = burst_history[-1]
                    burst_start -= prev[0] + prev[1]
                burst_history.append((i - burst_frames - 1, burst_frames + 1))
                burst_ratio.append(burst_start / (burst_frames + 1))
                total_burst_frames += burst_frames + 1
                burst_frames = 0
    if speed_above == 0:
        speed_ratio = 0.0
        speed_distance_ratio = 0.0
    else:
        speed_distance_ratio = low_speed_distance / high_speed_distance
        speed_ratio = speed_below / speed_above
    if burst_ratio:
        burst_min = float(np.amin(burst_ratio))
        burst_max = float(np.amax(burst_ratio))
        burst_mean = float(np.mean(burst_ratio))
    else:
        burst_min = burst_max = burst_mean = 0.0
    burst_chance = len(burst_ratio) / len(records)
    burst_per_frame = total_burst_frames / len(records)
    return np.array([
        speed_distance_ratio, speed_ratio, burst_min, burst_max, burst_mean,
        burst_chance, burst_per_frame,
    ])


def forest_features(thermal, filtered, background, regions, buf_len=1,
                    normalize=True):
    """Features for a list of regions over whole-frame arrays.

    thermal/filtered: (T, H, W); background: (H, W); regions: RegionRow-likes
    whose frame_number indexes the arrays. Blank/degenerate regions are
    skipped and reset the movement lookback, exactly like the reference's
    prev_count reset (forestmodel.py:321-325, 344-356).

    buf_len=1 -> per-frame matrix (N, 11) (the FP gate input at head).
    buf_len>1 -> one aggregated track vector of MVM_FEATURE_DIM (188):
    [avg, std, max, min, max-min] x 36 with per-feature lag-corrected
    divisors, 7 burst features, and the region count
    (reference forestmodel.py:299-440).

    Returns (X, frames_used, masses); (None, None, None) when no valid
    region (or, for buf_len>1, fewer valid frames than buf_len).
    """
    background = np.asarray(background, np.float32)
    back_med = np.median(background)
    medians = {}
    frames_used = []
    masses = []

    per_frame11 = []
    movement = []
    records = []
    prev_count = 0

    if buf_len > 1 and len(regions) < buf_len:
        return None, None, None

    for r in regions:
        if r.blank or r.width <= 0 or r.height <= 0:
            prev_count = 0
            continue
        t = r.frame_number
        if t not in medians:
            # float32 median scalar, matching the reference's float32 frames
            medians[t] = np.median(np.float32(thermal[t]))
        th_c = thermal[t, r.y : r.bottom, r.x : r.right]
        fi_c = filtered[t, r.y : r.bottom, r.x : r.right]
        bk_c = background[r.y : r.bottom, r.x : r.right]
        vec, cent = frame_feature_vector(
            th_c, fi_c, bk_c, back_med, medians[t], r.x, r.y
        )
        frames_used.append(t)
        masses.append(r.mass)
        if buf_len == 1:
            per_frame11.append(vec)
        else:
            rec = _FrameRecord(cent, buf_len)
            sqrt_area = vec[0]
            for i in range(min(buf_len, prev_count)):
                prev = records[-i - 1]
                vel = cent - prev.cent
                rec.speed[i] = np.sqrt(np.sum(vel * vel))
                rec.rel_speed[i] = rec.speed[i] / sqrt_area
                rec.rel_speed_x[i] = np.abs(vel[0]) / sqrt_area
                rec.rel_speed_y[i] = np.abs(vel[1]) / sqrt_area
                rec.speed_x[i] = np.abs(vel[0])
                rec.speed_y[i] = np.abs(vel[1])
            records.append(rec)
            hd = hist_diff(bk_c, th_c, normalize=normalize)
            movement.append(_movement_vector(vec, rec, hd))
        prev_count += 1

    if buf_len == 1:
        if not per_frame11:
            return None, None, None
        return np.array(per_frame11), frames_used, masses

    f_count = len(movement)
    # strictly MORE frames than the deepest lag (5): at f_count == buf_len
    # the move_5 columns' divisor n = f_count - 5 hits 0 and avg/std go NaN
    if f_count <= buf_len:
        return None, None, None
    mv = np.array(movement)
    n = f_count - _LAG
    maximum = mv.max(axis=0)
    # zero-skipping running minimum (reference forestmodel.py:368-373):
    # zeros mean "no sample yet" and are replaced by the first value seen.
    minimum = mv[0].copy()
    for row in mv[1:]:
        cur_zero = minimum == 0
        minimum[cur_zero] = row[cur_zero]
        non_zero = row != 0
        minimum[non_zero] = np.minimum(minimum[non_zero], row[non_zero])
    # sequential accumulation, matching the reference's running
    # `avg_features += features` (forestmodel.py:365,375) to the last ulp
    total = mv[0].copy()
    for row in mv[1:]:
        total += row
    avg = total / n
    std = np.sqrt(np.sum((mv - avg) ** 2, axis=0) / n)
    burst = _burst_features(records, avg[5])
    X = np.hstack((avg, std, maximum, minimum, maximum - minimum, burst,
                   [len(regions)]))
    return X, frames_used, masses


def track_feature_vector(thermal, filtered, background, regions,
                         apply_norms=True):
    """The per-track 188-dim MVM feature vector, standardized with the
    featurenorms tables (what the CNN's feature branch consumes at train
    and classify time — reference interpreter.py:439-445,469-472).

    Returns zeros when the track has too few valid frames to aggregate."""
    X, _, _ = forest_features(thermal, filtered, background, regions,
                              buf_len=5)
    if X is None:
        return np.zeros(MVM_FEATURE_DIM, np.float32)
    if apply_norms:
        X = normalize_features(X)
    return np.asarray(X, np.float32)


def aggregate_track_features(per_frame: np.ndarray) -> np.ndarray:
    """DEPRECATED shim kept for older callers: [avg, std, max, min, diff]
    over per-frame 11-dim features. New code uses track_feature_vector."""
    if per_frame is None or len(per_frame) == 0:
        return np.zeros(5 * len(BASE_FEATURE_NAMES), np.float32)
    pf = np.asarray(per_frame, np.float64)
    agg = np.concatenate(
        [pf.mean(0), pf.std(0), pf.max(0), pf.min(0), pf.max(0) - pf.min(0)]
    )
    return agg.astype(np.float32)


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
        # buffer_length=1 -> per-frame 11-dim rows; >1 -> one 188-dim
        # aggregated vector per track (reference forestmodel.py:119).
        self.buffer_length = self.params.get("buffer_length", 1)
        self.features_used = self.params.get("features_used")
        # featurenorms standardization for aggregated vectors (reference
        # forestmodel.py:106-111); per-frame 11-dim rows are never normed.
        self.normalize_features = self.params.get("normalize_features", True)
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
        if self.buffer_length > 1:
            n = len(self.features_used) if self.features_used else MVM_FEATURE_DIM
            return 1, (1, n)
        return 1, (1, len(BASE_FEATURE_NAMES))

    def predict(self, X):
        if self.model is None:
            return np.full((len(X), len(self.labels)), 1.0 / len(self.labels))
        return self.model.predict_proba(X)

    def predict_track(self, clip_ctx, track, predict_from_last=None,
                      max_frames=None, num_predictions=None,
                      last_frame_predicted=None, **_):
        """Feature predictions (reference forestmodel process_track +
        predict_track). Returns (frames, predictions, masses) or None."""
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
        X, frame_idx, masses = forest_features(
            thermal, filtered, background, remapped,
            buf_len=self.buffer_length,
        )
        if X is None:
            return None
        if self.buffer_length > 1:
            if self.normalize_features:
                X = normalize_features(X)
            if self.features_used:
                X = np.take(X, feature_mask(self.features_used))
            X = X[np.newaxis, :]
            frames = [regions[-1].frame_number]
            masses = [np.mean(masses)]
        else:
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
