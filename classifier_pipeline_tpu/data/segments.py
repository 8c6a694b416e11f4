"""Segment sampling — selects which 25-frame subsets of a track get
classified / trained on (reference src/ml_tools/datasetstructures.py:972-1380
get_segments + get_top_mass_segments).

Pure host-side index math on tiny arrays (the heavy per-pixel work those
indices drive runs on device). The RNG CALL SEQUENCE is contract: it mirrors
the reference call-for-call (np.random.default_rng(seed) per segment type,
plus the module-level np.random.shuffle quirk in the masked long-track
branch) so that --seed runs pick identical frames. tests/test_segments_rng.py
pins the trace; don't reorder draws without updating it against the
reference oracle.

All ten SegmentTypes are implemented, including ELONGATION (border-aware
most-elongated-region pick, reference :1048-1116) and TOP_SEQUENTIAL
(highest-mass sliding windows, reference :1304-1380).
"""

from __future__ import annotations

import dataclasses
import enum
import logging
from typing import Optional

import numpy as np

FP_LABELS = ["false-positive", "insect"]

# ELONGATION recomputes border contact against the standard thermal crop
# rectangle (reference :1049 tools.Rectangle(1, 1, 158, 118)); note the
# reference compares region.right/bottom to the rectangle's WIDTH/HEIGHT
# fields, not x+width — a quirk we keep.
_ELONG_EDGE_X0, _ELONG_EDGE_Y0 = 1, 1
_ELONG_EDGE_X1, _ELONG_EDGE_Y1 = 158, 118


class SegmentType(enum.Enum):
    IMPORTANT_RANDOM = 0
    ALL_RANDOM = 1
    IMPORTANT_SEQUENTIAL = 2
    ALL_SEQUENTIAL = 3
    TOP_SEQUENTIAL = 4
    ALL_SECTIONS = 5
    TOP_RANDOM = 6
    ALL_RANDOM_NOMIN = 7
    ALL_RANDOM_MASKED = 8
    ELONGATION = 9


@dataclasses.dataclass
class SegmentHeader:
    clip_id: object
    track_id: object
    start_frame: int
    frames: int
    weight: float
    mass: float
    label: Optional[str]
    regions: list
    frame_indices: np.ndarray
    filtered: bool = False
    station_id: object = None
    source_file: object = None
    track_median_mass: float = 0
    movement_data: object = None
    best_mass: bool = False
    top_mass: bool = False

    @property
    def avg_mass(self):
        return self.mass / max(self.frames, 1)

    @property
    def id(self):
        return f"{self.clip_id}-{self.track_id}-{int(self.frame_indices[0])}"

    @property
    def unique_id(self):
        return self.id

    @property
    def bin_id(self):
        return f"{self.clip_id}-{self.track_id}"

    @property
    def frame_numbers(self):
        return self.frame_indices

    @property
    def track_bounds(self):
        return self.regions


def _usable_frame_numbers(regions, mass_history, start_frame, ffc_frames,
                          skip_ffc, frame_min_mass, fp_frames, label):
    """Frame numbers eligible for sampling: non-blank, non-degenerate,
    FFC-free, above the per-frame mass floor (reference :1012-1029)."""
    track_is_massless = np.sum(mass_history) == 0
    ffc = set(ffc_frames or [])
    keep = []
    for r in regions:
        if r.blank or r.width <= 0 or r.height <= 0:
            continue
        if not track_is_massless and r.mass <= 0:
            continue
        if ffc_frames is not None and skip_ffc and r.frame_number in ffc:
            continue
        if (frame_min_mass is not None and not track_is_massless
                and r.mass < frame_min_mass):
            continue
        keep.append(r.frame_number)
    if fp_frames is not None and label not in FP_LABELS:
        keep = [f for f in keep if f not in fp_frames]
    return keep


def _region_touches_border(r):
    """The ELONGATION border test (reference region.py:154-161 with the
    Rectangle(1,1,158,118) bounds). A cropped region at 160x120 necessarily
    touches this rectangle, so the geometric test subsumes was_cropped."""
    return (
        getattr(r, "was_cropped", False)
        or r.x <= _ELONG_EDGE_X0
        or r.y <= _ELONG_EDGE_Y0
        or r.right >= _ELONG_EDGE_X1
        or r.bottom >= _ELONG_EDGE_Y1
    )


def _elongation(r):
    long_side = max(r.width, r.height)
    short_side = min(r.width, r.height)
    return long_side / short_side


def _pad_with_resampled(frames, want, rng):
    """Top the selection up to `want` by re-drawing from itself without
    replacement (reference :1237-1245). One rng.choice call when short."""
    short_by = want - len(frames)
    if short_by > 0:
        again = rng.choice(frames, min(short_by, len(frames)), replace=False)
        frames = np.concatenate([frames, again])
    return frames


def _elongation_segment(clip_id, track_id, start_frame, regions, usable,
                        mass_history, segment_width, label, rng):
    """One segment built from the most-elongated non-border regions
    (reference :1048-1116)."""
    chosen_regions = regions[usable - start_frame]
    inside = [r for r in chosen_regions if not _region_touches_border(r)]
    touching = [r for r in chosen_regions if _region_touches_border(r)]

    ranked = sorted(inside, key=_elongation, reverse=True)[:25]
    if len(inside) < 4:
        # too few clean regions: top up with the biggest border ones,
        # but only to half a segment
        by_area = sorted(touching, key=lambda r: r.area, reverse=True)
        deficit = segment_width // 2 - len(ranked)
        if deficit > 0:
            ranked.extend(by_area[:deficit])

    picked = [r.frame_number for r in ranked]
    picked = _pad_with_resampled(picked, segment_width, rng)
    picked = np.sort(np.array(picked))
    weights = mass_history[picked - start_frame]
    return SegmentHeader(
        clip_id,
        track_id,
        start_frame=start_frame,
        frames=segment_width,
        weight=1,
        mass=np.sum(weights),
        label=label,
        regions=ranked,
        frame_indices=picked,
        filtered=False,
    )


def _top_mass_segments(clip_id, track_id, label, segment_width,
                       segment_frame_spacing, mass_history, ffc_frames,
                       regions, start_frame, lower_mass, s_min_mass,
                       source_file=None):
    """Non-overlapping highest-mass sliding windows (reference
    get_top_mass_segments, :1304-1380). No RNG draws."""
    stats = {"segment_mass": 0, "too short": 0}
    out = []
    ffc = set(ffc_frames or [])

    window_mass = []
    for at in range(max(1, len(mass_history) - segment_width)):
        if any((at + k + start_frame) in ffc for k in range(segment_width)):
            continue
        window_mass.append((at, np.sum(mass_history[at : at + segment_width])))
    ranked = sorted(window_mass, key=lambda w: w[1], reverse=True)

    budget = int(min(len(ranked),
                     max(1, len(regions) // segment_frame_spacing)))
    first = True
    while ranked:
        at, mass = ranked[0]
        if not first and (mass / segment_width < lower_mass
                          or mass / segment_width < s_min_mass):
            break
        span = min(segment_width, len(regions))
        rel = np.arange(span) + at
        out.append(
            SegmentHeader(
                clip_id,
                track_id,
                start_frame=start_frame,
                frames=segment_width,
                weight=1,
                mass=mass,
                label=label,
                regions=list(regions[rel]),
                frame_indices=rel + start_frame,
                movement_data=_movement_summary(regions[at : at + segment_width]),
                best_mass=first,
                top_mass=True,
                source_file=source_file,
            )
        )
        first = False
        # drop windows whose start lands within 2/3 of a segment of this one
        near = segment_width / 3 * 2
        ranked = [w for w in ranked if w[0] <= at - near or w[0] >= at + near]
        if len(out) == budget:
            break
    return out, stats


def _movement_summary(regions):
    """Per-window movement matrix: [l,t,r,b, mass, dx, dy, dx/sqrt(area),
    dy/sqrt(area)] per frame (reference get_movement_data, :957-968)."""
    area = np.array([r.area for r in regions], dtype=float)
    cx = np.array([r.x + r.width / 2 for r in regions])
    cy = np.array([r.y + r.height / 2 for r in regions])
    dx = np.hstack((0, np.diff(cx)))
    dy = np.hstack((0, np.diff(cy)))
    ltrb = np.array([[r.x, r.y, r.right, r.bottom] for r in regions])
    mass = np.array([r.mass for r in regions])
    return np.hstack(
        (ltrb, np.vstack((mass, dx, dy, dx / area**0.5, dy / area**0.5)).T)
    )


def _segment_weight(avg_mass):
    """Mass-band training weight (reference :1262-1267)."""
    if avg_mass < 50:
        return 0.75
    if avg_mass < 100:
        return 1
    return 1.2


def get_segments(
    clip_id,
    track_id,
    start_frame,
    regions,
    segment_width=25,
    segment_frame_spacing=9,
    label=None,
    segment_min_mass=None,
    ffc_frames=(),
    lower_mass=0,
    repeats=1,
    min_frames=None,
    segment_types=(SegmentType.ALL_RANDOM_MASKED,),
    max_segments=None,
    dont_filter=False,
    skip_ffc=True,
    frame_min_mass=None,
    fp_frames=None,
    repeat_frame_indices=True,
    min_segments=None,
    seed=None,
    source_file=None,
):
    """regions: sequence with .frame_number/.mass/.blank/.width/.height attrs
    (postprocess.RegionRow works). Returns (segments, filtered_stats)."""
    regions = np.array(regions, dtype=object)
    if min_frames is None:
        min_frames = segment_width / 4.0
    segments = []
    mass_history = np.uint16([r.mass for r in regions])
    stats = {"segment_mass": 0, "too short": 0}

    for segment_type in segment_types:
        mass_floor = segment_min_mass
        if segment_type == SegmentType.ALL_RANDOM_NOMIN:
            mass_floor = None

        usable = _usable_frame_numbers(
            regions, mass_history, start_frame, ffc_frames, skip_ffc,
            frame_min_mass, fp_frames, label,
        )
        if not usable:
            logging.warning("Nothing to load for %s - %s", clip_id, track_id)
            return [], stats
        usable = np.array(usable)
        if mass_floor is not None:
            mass_floor = min(
                mass_floor, np.median(mass_history[usable - start_frame])
            )
        else:
            mass_floor = 1

        rng = np.random.default_rng(seed=seed)

        if segment_type == SegmentType.ELONGATION:
            segments.append(
                _elongation_segment(clip_id, track_id, start_frame, regions,
                                    usable, mass_history, segment_width,
                                    label, rng)
            )
            continue

        if segment_type == SegmentType.TOP_RANDOM:
            # keep only the 50 heaviest frames (reference :1117-1125)
            heaviest = sorted(
                usable,
                key=lambda f: mass_history[f - start_frame],
                reverse=True,
            )[:50]
            usable = np.array(sorted(heaviest))

        if segment_type == SegmentType.TOP_SEQUENTIAL:
            top, top_stats = _top_mass_segments(
                clip_id, track_id, label, segment_width,
                segment_frame_spacing, mass_history, ffc_frames, regions,
                start_frame, lower_mass, mass_floor, source_file=source_file,
            )
            segments.extend(top)
            for key, n in top_stats.items():
                stats[key] = stats.get(key, 0) + n
            continue

        if len(usable) < min_frames and (min_segments == 0
                                         or min_segments is None):
            stats["too short"] += 1
            continue

        n_segments = int(max(1, len(usable) // segment_frame_spacing))
        mask_span = 25
        if max_segments is not None and segment_type != SegmentType.ALL_SECTIONS:
            n_segments = min(max_segments, n_segments)
            mask_span = max(mask_span, len(usable) // n_segments)

        shuffled_pick = segment_type in (
            SegmentType.IMPORTANT_RANDOM,
            SegmentType.ALL_RANDOM,
            SegmentType.ALL_RANDOM_NOMIN,
            SegmentType.TOP_RANDOM,
            SegmentType.ALL_RANDOM_MASKED,
            None,
        )
        masked = segment_type == SegmentType.ALL_RANDOM_MASKED
        long_masked = masked and len(usable) >= 40

        for _ in range(repeats):
            if masked:
                slot_ids = np.arange(len(regions))
                slot_frames = slot_ids + start_frame
                open_slots = np.full(len(regions), False)
                open_slots[usable - start_frame] = True
            pool = None
            if not long_masked:
                pool = usable.copy()
                if shuffled_pick:
                    # RNG-parity: the reference shuffles here even for short
                    # masked tracks, although the masked branch below then
                    # overwrites the array — the draw must still happen.
                    rng.shuffle(pool)

            for i in range(n_segments):
                if masked:
                    if not long_masked:
                        pool = slot_ids[open_slots]
                    else:
                        window = open_slots.copy()
                        at = i * mask_span
                        window[at : at + mask_span] = False
                        pool = np.uint32(slot_ids[window])
                        # reference quirk (:1197): module-level np.random
                        np.random.shuffle(pool)

                if (len(pool) == 0 or min_segments is None
                        or len(segments) >= min_segments):
                    if (len(pool) < segment_width / 2.0 and len(segments) > 0
                            ) or len(pool) < segment_width / 4:
                        break

                if segment_type == SegmentType.ALL_SECTIONS:
                    window = pool[: int(segment_width * 2.2)]
                    draw = rng.choice(
                        len(window), min(segment_width, len(window)),
                        replace=False,
                    )
                    picked = window[draw]
                    pool = pool[segment_width:]
                elif masked:
                    taken = pool[:segment_width]
                    open_slots[taken] = False
                    picked = slot_frames[taken]
                elif shuffled_pick:
                    picked = pool[:segment_width]
                    pool = pool[segment_width:]
                else:
                    lo = i * segment_frame_spacing
                    hi = min(len(pool), lo + segment_width)
                    picked = pool[lo:hi]

                picked = _pad_with_resampled(picked, segment_width, rng)
                picked.sort()
                rel = picked - start_frame
                picked_mass = mass_history[rel]
                total_mass = np.sum(picked_mass)
                avg_mass = total_mass / len(picked_mass)
                below_floor = False
                if mass_floor and avg_mass < mass_floor:
                    if not dont_filter:
                        stats["segment_mass"] += 1
                        continue
                    below_floor = True

                if repeat_frame_indices and len(picked) < segment_width:
                    # duplicate random frames (with replacement) so every
                    # segment carries exactly segment_width indices
                    extras = rng.choice(picked, segment_width - len(picked))
                    picked = np.sort(np.concatenate([picked, extras]))

                segments.append(
                    SegmentHeader(
                        clip_id,
                        track_id,
                        start_frame=start_frame,
                        frames=segment_width,
                        weight=_segment_weight(avg_mass),
                        mass=total_mass,
                        label=label,
                        regions=list(regions[rel]),
                        frame_indices=np.array(picked),
                        filtered=below_floor,
                        source_file=source_file,
                    )
                )
    return segments, stats
