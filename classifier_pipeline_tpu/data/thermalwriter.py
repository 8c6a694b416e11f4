"""Thermal training-record writing (reference src/ml_tools/thermalwriter.py +
tfwriter.py).

Per sample (a 25-frame segment or single frame) writes a tf.train.Example
with 45x45 thermal+filtered float crops, per-frame forest features, label
and identity fields — the exact schema the reference's tf.data readers
decode. Sharded GZIP TFRecords via the native record writer; shards are
written by a process pool like the reference's 8-writer fan-out.
"""

from __future__ import annotations

import hashlib
import logging
import multiprocessing
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.models.forest import track_feature_vector

from . import tfrecords as tfr
from .rawdb import RawDatabase

RESIZE_DIM = 45
EDGE_OFFSET = (7, 7, 6, 6)
CROP_RECT = (0, 0, 160, 120)
SANITY_MIN, SANITY_MAX = 1000, 50000


def _resize_and_pad(img, region, pad, crop_rect=CROP_RECT,
                    edge_offset=EDGE_OFFSET, dim=RESIZE_DIM):
    """NumPy mirror of reference imageprocessing.resize_and_pad with
    keep_edge + the (7,7,6,6) training offsets (thermalwriter.py:341-347)."""
    h, w = img.shape
    scale = min(dim / h, dim / w)
    tw = int(np.clip(round(w * scale), 1, dim))
    th = int(np.clip(round(h * scale), 1, dim))
    # cv2 INTER_LINEAR resize, float path
    ys = (np.arange(th) + 0.5) * h / th - 0.5
    xs = (np.arange(tw) + 0.5) * w / tw - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    img = img.astype(np.float32)
    resized = (
        img[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + img[np.ix_(y0, x1)] * (1 - fy) * fx
        + img[np.ix_(y1, x0)] * fy * (1 - fx)
        + img[np.ix_(y1, x1)] * fy * fx
    )
    out = np.full((dim, dim), pad, np.float32)
    ox = (dim - tw) // 2
    oy = (dim - th) // 2
    cx, cy, cw, ch = crop_rect
    if region.x <= cx:
        ox = min(edge_offset[0], dim - tw)
    elif region.x + region.width >= cx + cw:
        ox = max((dim - edge_offset[2]) - tw, 0)
    if region.y <= cy:
        oy = min(edge_offset[1], dim - th)
    elif region.y + region.height >= cy + ch:
        oy = max(dim - th - edge_offset[3], 0)
    out[oy : oy + th, ox : ox + tw] = resized
    return out


def _normalize(data, mn, mx, new_max=255.0):
    if mx == mn:
        if mx == 0:
            return np.zeros_like(data, np.float32), False
        return data.astype(np.float32) / mx, True
    return new_max * (np.float32(data) - mn) / (mx - mn), True


def sample_data_for_clip(db: RawDatabase, tracks_samples, labels,
                         thermal_diff_norm=False):
    """Build (sample, (thermals, filtereds), features) tuples for every
    sample of every track in a clip (reference thermalwriter.get_data)."""
    thermal, filtered = db.frames
    background = db.background
    medians = np.median(thermal, axis=(1, 2))
    out = []
    for track, samples in tracks_samples:
        if not samples:
            continue
        regions = {fn: r for fn, r in track.regions_by_frame.items()}
        # diff norm limits over the whole track
        min_diff = None
        max_diff = 0.0
        thermal_min = 0
        for fn, r in regions.items():
            if r.blank or r.width <= 0 or r.height <= 0 or fn >= len(filtered):
                continue
            sub = filtered[fn, r.y : r.bottom, r.x : r.right]
            if sub.size == 0:
                continue
            mn, mx = float(sub.min()), float(sub.max())
            if min_diff is None or mn < min_diff:
                min_diff = mn
            if mx > max_diff:
                max_diff = mx
        if min_diff is None:
            continue
        # per-track 188-dim MVM vector: [avg,std,max,min,diff] x 36 movement
        # features + 7 burst features + frame count, featurenorms-normalized
        # (reference thermalwriter.py:310-317 forest_features(normalize=True)
        # feeding the thermaldataset.py:258 FixedLenSequenceFeature([36*5+8])
        # schema); zeros when the track is too short to aggregate.
        bounds = [r for r in track.bounds_history if not r.blank
                  and r.width > 0 and r.height > 0 and r.frame_number < len(thermal)]
        features = track_feature_vector(thermal, filtered, background, bounds)

        cache = {}
        for sample in samples:
            thermals, filtereds = [], []
            usable = True
            for fn in sample.frame_numbers:
                fn = int(fn)
                if fn in cache:
                    th_c, fi_c = cache[fn]
                else:
                    r = regions.get(fn)
                    if r is None or fn >= len(thermal):
                        usable = False
                        break
                    th = thermal[fn, r.y : r.bottom, r.x : r.right]
                    fi = filtered[fn, r.y : r.bottom, r.x : r.right]
                    if th.size == 0:
                        usable = False
                        break
                    if th.max() > SANITY_MAX or th.min() < SANITY_MIN:
                        logging.error(
                            "Strange values clip %s frame %s", sample.clip_id, fn
                        )
                        usable = False
                        break
                    th_r = _resize_and_pad(th, r, pad=float(th.min()))
                    fi_r = _resize_and_pad(fi, r, pad=0.0)
                    th_r = th_r - medians[fn]
                    if not thermal_diff_norm and thermal_min == 0:
                        th_r = np.clip(th_r, 0, None)
                    th_r, ok = _normalize(th_r, th_r.min(), th_r.max())
                    if not ok:
                        th_r = np.zeros_like(th_r)
                    fi_r, ok = _normalize(fi_r, min_diff, max_diff)
                    fi_r = np.clip(fi_r, 0, 255)
                    if not ok:
                        fi_r = np.zeros_like(fi_r)
                    cache[fn] = (th_r, fi_r)
                    th_c, fi_c = th_r, fi_r
                thermals.append(th_c)
                filtereds.append(fi_c)
            if usable and thermals:
                out.append((sample, (thermals, filtereds), features))
    return out


def create_tf_example(sample, data, features, labels, num_frames):
    """reference thermalwriter.create_tf_example:58-138."""
    areas = [r.area for r in sample.track_bounds] if hasattr(
        sample, "track_bounds"
    ) and len(getattr(sample, "track_bounds", [])) else [
        sample.region.area
    ] if hasattr(sample, "region") else [1]
    average_dim = int(round(np.mean(areas) ** 0.5))
    thermals = list(data[0])
    filtereds = list(data[1])
    image_height, image_width = thermals[0].shape
    while len(thermals) < num_frames:
        thermals.append(np.zeros(thermals[0].shape))
        filtereds.append(np.zeros(filtereds[0].shape))
    thermals = np.array(thermals, np.float32)
    filtereds = np.array(filtereds, np.float32)
    thermal_key = hashlib.sha256(thermals).hexdigest()
    filtered_key = hashlib.sha256(filtereds).hexdigest()
    avg_mass = int(round(sample.mass / len(sample.frame_numbers))) if hasattr(
        sample, "mass"
    ) else 0
    feature_dict = {
        "image/filtered": tfr.int64_feature(1 if getattr(sample, "filtered", False) else 0),
        "image/avg_mass": tfr.int64_feature(avg_mass),
        "image/track_median_mass": tfr.int64_feature(
            int(getattr(sample, "track_median_mass", 0))
        ),
        "image/avg_dim": tfr.int64_feature(average_dim),
        "image/height": tfr.int64_feature(image_height),
        "image/width": tfr.int64_feature(image_width),
        "image/clip_id": tfr.int64_feature(int(sample.clip_id)),
        "image/track_id": tfr.int64_feature(int(sample.track_id)),
        "image/filename": tfr.bytes_feature(str(sample.source_file or "")),
        "image/source_id": tfr.bytes_feature(str(sample.unique_id)),
        "image/thermalencoded": tfr.float_list_feature(thermals.ravel()),
        "image/filteredencoded": tfr.float_list_feature(filtereds.ravel()),
        "image/features": tfr.float_list_feature(np.asarray(features, np.float32).ravel()),
        "image/filteredkey/sha256": tfr.bytes_feature(filtered_key),
        "image/thermalkey/sha256": tfr.bytes_feature(thermal_key),
        "image/format": tfr.bytes_feature("jpeg"),
        "image/class/text": tfr.bytes_feature(sample.label),
        "image/class/label": tfr.int64_feature(labels.index(sample.label)),
        "image/country_id": tfr.bytes_feature(str(getattr(sample, "country_code", None))),
    }
    return tfr.encode_example(feature_dict)


def create_tf_records(dataset, output_dir, labels, num_shards=20,
                      num_frames=25, workers=0, **kwargs):
    """Write a split's samples to sharded GZIP TFRecords (reference
    tfwriter.create_tf_records:23-110)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    # group samples by clip so each clip decodes once
    by_clip = {}
    for s in dataset.samples:
        by_clip.setdefault(str(s.source_file), []).append(s)
    jobs = list(by_clip.items())
    writers = [
        tfr.RecordWriter(output_dir / f"{i:05d}-of-{num_shards:05d}.tfrecord")
        for i in range(num_shards)
    ]
    counts = 0
    try:
        for source_file, samples in jobs:
            db = RawDatabase(source_file)
            try:
                db.load_frames()
            except Exception:
                logging.error("cannot decode %s", source_file, exc_info=True)
                continue
            by_track = {}
            for s in samples:
                by_track.setdefault(s.track_id, []).append(s)
            header = db.get_clip_tracks(dataset.tag_precedence)
            track_map = {t.track_id: t for t in header.tracks} if header else {}
            tracks_samples = [
                (track_map[tid], ss)
                for tid, ss in by_track.items()
                if tid in track_map
            ]
            data = sample_data_for_clip(db, tracks_samples, labels)
            for sample, arrs, features in data:
                example = create_tf_example(
                    sample, arrs, features, labels, num_frames
                )
                writers[counts % num_shards].write(example)
                counts += 1
    finally:
        for w in writers:
            w.close()
    logging.info("Wrote %d examples to %s", counts, output_dir)
    return counts
