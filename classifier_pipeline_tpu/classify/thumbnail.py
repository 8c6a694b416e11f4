"""Thumbnail selection (reference src/classify/thumbnail.py).

Scores each non-blank region of a track by mass / contour complexity /
median-temperature lift and picks the best as the recording's thumbnail.

Deviation from the reference: cv2.findContours with TC89_L1 returns a
compressed polyline; we count the largest external boundary by Moore
neighbour tracing (pure NumPy). Scores therefore differ in absolute value
but preserve ranking behavior; the "contours" metadata field is the boundary
length.
"""

from __future__ import annotations

import math
from collections import namedtuple

import numpy as np

from classifier_pipeline_tpu.utils.tools import get_ndimage

Stat = namedtuple("Stat", "region contours median_diff")

THUMBNAIL_SIZE = 64

# Moore neighbourhood in clockwise order starting from W
_MOORE = [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (1, -1)]


def largest_boundary_length(mask: np.ndarray) -> int:
    """Length of the longest external boundary among connected components.

    Single vectorized pass: a pixel's 4-neighbour foreground count within its
    own 8-connected component equals its count within the whole mask (two
    distinct 8-components are never 4-adjacent — a shared edge would merge
    them), so the boundary mask is computed once and split per component with
    one bincount instead of a per-label loop."""
    if mask.size == 0 or not mask.any():
        return 0
    ndimage = get_ndimage()

    fg = mask > 0
    labels, n = ndimage.label(fg, structure=np.ones((3, 3)))
    if n == 0:
        return 0
    padded = np.pad(fg, 1)
    nb = (
        padded[:-2, 1:-1].astype(np.uint8)
        + padded[2:, 1:-1]
        + padded[1:-1, :-2]
        + padded[1:-1, 2:]
    )
    boundary = fg & (nb < 4)
    counts = np.bincount(labels[boundary], minlength=n + 1)
    return int(counts[1:].max())


def frame_medians(thermal):
    """Per-frame medians of the whole clip; compute ONCE per clip and pass to
    the per-track calls below (identical across tracks, and the (T, H*W)
    partition is the dominant cost)."""
    return np.median(thermal, axis=(1, 2))


def get_track_thumb_stats(thermal, masks, track, background_thresh=20,
                          medians=None):
    """thermal: (T,H,W) uint16; masks: (T,H,W) uint8 detection masks."""
    max_mass = 0
    max_median_diff = 0.0
    min_median_diff = 0.0
    max_contour = 0
    stats = []
    if medians is None:
        medians = frame_medians(thermal)
    for region in track.bounds:
        if region.blank or region.mass == 0:
            continue
        t = region.frame_number
        sub_mask = masks[t, region.y : region.bottom, region.x : region.right]
        points = largest_boundary_length(sub_mask)
        if points == 0:
            continue
        max_contour = max(max_contour, points)
        thermal_sub = thermal[t, region.y : region.bottom, region.x : region.right]
        masked = thermal_sub[sub_mask > 0]
        if masked.size == 0:
            continue
        median_diff = float(np.median(masked) - medians[t])
        max_mass = max(max_mass, region.mass)
        max_median_diff = max(max_median_diff, median_diff)
        min_median_diff = min(min_median_diff, median_diff)
        stats.append(Stat(region, points, median_diff))
    return stats, max_mass, max_median_diff, min_median_diff, max_contour


def score(stat, max_mass, max_median_diff, min_median_diff, max_contour):
    region = stat.region
    mass_percent = (region.mass / max_mass) * 40 if max_mass else 0
    pts = (stat.contours / max_contour) * 50 if max_contour else 0
    dx = region.centroid[0] - region.mid[0]
    dy = region.centroid[1] - region.mid[1]
    centroid_mid = math.sqrt(dx * dx + dy * dy) * 2
    if max_median_diff == 0:
        diff = 0.0
        if min_median_diff != 0:
            diff = (stat.median_diff + abs(min_median_diff)) / abs(min_median_diff) * 40
    else:
        diff = stat.median_diff / max_median_diff * 40
    s = mass_percent + pts + diff - centroid_mid
    if (
        region.x <= 1
        or region.y <= 1
        or region.bottom >= 119
        or region.right >= 159
    ):
        s -= 1000
    return s


def get_track_thumb_stats_from_rows(track, medians):
    """Same stats as get_track_thumb_stats, but from the scan's
    device-computed per-row component stats (boundary length + component
    thermal median) — no detection masks needed on the host. ``medians``:
    per-frame thermal medians (device-computed)."""
    max_mass = 0
    max_median_diff = 0.0
    min_median_diff = 0.0
    max_contour = 0
    stats = []
    for region in track.bounds:
        if region.blank or region.mass == 0:
            continue
        points = int(getattr(region, "contours", 0))
        if points == 0:
            continue
        raw = getattr(region, "median_raw", float("nan"))
        if raw != raw:  # nan: stats unavailable for this row
            continue
        max_contour = max(max_contour, points)
        median_diff = float(raw - medians[region.frame_number])
        max_mass = max(max_mass, region.mass)
        max_median_diff = max(max_median_diff, median_diff)
        min_median_diff = min(min_median_diff, median_diff)
        stats.append(Stat(region, points, median_diff))
    return stats, max_mass, max_median_diff, min_median_diff, max_contour


def thumbnail_metadata_from_rows(track, medians):
    """thumbnail_metadata using device row stats instead of host masks."""
    stats, max_mass, max_md, min_md, max_c = get_track_thumb_stats_from_rows(
        track, medians
    )
    if len(stats) == 0:
        if len(track.bounds) == 0:
            return None
        best, best_score = Stat(track.bounds[0], 0, 0), 0
    else:
        ranked = sorted(
            stats,
            key=lambda s: score(s, max_mass, max_md, min_md, max_c),
            reverse=True,
        )
        best = ranked[0]
        best_score = score(best, max_mass, max_md, min_md, max_c)
    return {
        "region": best.region.meta_dict(),
        "contours": int(best.contours),
        "median_diff": float(best.median_diff),
        "score": round(best_score),
    }


def get_thumbnail_info(thermal, masks, track, background_thresh=20,
                       medians=None):
    stats, max_mass, max_md, min_md, max_c = get_track_thumb_stats(
        thermal, masks, track, background_thresh, medians=medians
    )
    if len(stats) == 0:
        if len(track.bounds) == 0:
            return None, 0
        return Stat(track.bounds[0], 0, 0), 0
    ranked = sorted(
        stats, key=lambda s: score(s, max_mass, max_md, min_md, max_c), reverse=True
    )
    return ranked[0], score(ranked[0], max_mass, max_md, min_md, max_c)


def thumbnail_metadata(thermal, masks, track, background_thresh=20,
                       medians=None):
    best, best_score = get_thumbnail_info(
        thermal, masks, track, background_thresh, medians=medians
    )
    if best is None:
        return None
    return {
        "region": best.region.meta_dict(),
        "contours": int(best.contours),
        "median_diff": float(best.median_diff),
        "score": round(best_score),
    }


def best_trackless_thumb(thermal, region_history):
    """reference best_trackless_thumb: best-mass untracked region, else the
    warmest 64x64 window of the warmest frame (vectorized)."""
    best = None
    for regions in region_history:
        for r in regions:
            if best is None or r["mass"] > best["mass"]:
                best = r
    if best is not None:
        return best
    frame_means = thermal.mean(axis=(1, 2))
    t = int(np.argmax(frame_means))
    frame = thermal[t].astype(np.float64)
    # mean over all 64x64 windows via integral image
    c = np.cumsum(np.cumsum(frame, 0), 1)
    c = np.pad(c, ((1, 0), (1, 0)))
    S = THUMBNAIL_SIZE
    sums = c[S:, S:] - c[:-S, S:] - c[S:, :-S] + c[:-S, :-S]
    y, x = np.unravel_index(np.argmax(sums), sums.shape)
    return {
        "x": int(x),
        "y": int(y),
        "width": S,
        "height": S,
        "frame_number": t,
        "mass": 0,
        "pixel_variance": 0,
        "blank": False,
        "in_trap": False,
    }
