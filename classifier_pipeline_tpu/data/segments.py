"""Segment sampling (reference src/ml_tools/datasetstructures.py:972-1380
get_segments) — selects which 25-frame subsets of a track get classified /
trained on.

Pure host-side index math on tiny arrays (the heavy per-pixel work those
indices drive runs on device). RNG call pattern mirrors the reference
(np.random.default_rng(seed) + the module-level np.random.shuffle quirk in
the ALL_RANDOM_MASKED long-track branch) so --seed runs are reproducible in
the same way.
"""

from __future__ import annotations

import dataclasses
import enum
import logging
from typing import Optional

import numpy as np

FP_LABELS = ["false-positive", "insect"]


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
):
    """regions: sequence with .frame_number/.mass/.blank/.width/.height attrs
    (postprocess.RegionRow works). Returns (segments, filtered_stats)."""
    regions = np.array(regions, dtype=object)
    if min_frames is None:
        min_frames = segment_width / 4.0
    segments = []
    mass_history = np.uint16([r.mass for r in regions])
    filtered_stats = {"segment_mass": 0, "too short": 0}
    has_no_mass = np.sum(mass_history) == 0
    ffc_set = set(ffc_frames or [])

    for segment_type in segment_types:
        s_min_mass = segment_min_mass
        if segment_type == SegmentType.ALL_RANDOM_NOMIN:
            s_min_mass = None

        frame_indices = [
            r.frame_number
            for r in regions
            if (has_no_mass or r.mass > 0)
            and (ffc_frames is None or not skip_ffc or r.frame_number not in ffc_set)
            and not r.blank
            and r.width > 0
            and r.height > 0
            and ((has_no_mass or frame_min_mass is None) or r.mass >= frame_min_mass)
        ]
        if fp_frames is not None and label not in FP_LABELS:
            frame_indices = [f for f in frame_indices if f not in fp_frames]
        if len(frame_indices) == 0:
            logging.warning("Nothing to load for %s - %s", clip_id, track_id)
            return [], filtered_stats
        frame_indices = np.array(frame_indices)
        if s_min_mass is not None:
            s_min_mass = min(
                s_min_mass, np.median(mass_history[frame_indices - start_frame])
            )
        else:
            s_min_mass = 1

        rng = np.random.default_rng(seed=seed)

        if segment_type == SegmentType.TOP_RANDOM:
            frame_indices = sorted(
                frame_indices,
                key=lambda f_i: mass_history[f_i - start_frame],
                reverse=True,
            )
            frame_indices = np.array(sorted(frame_indices[:50]))
        if segment_type in (SegmentType.ELONGATION, SegmentType.TOP_SEQUENTIAL):
            raise NotImplementedError(
                f"{segment_type} port lands with the dataset-build phase"
            )
        if len(frame_indices) < min_frames and (
            min_segments == 0 or min_segments is None
        ):
            filtered_stats["too short"] += 1
            continue

        segment_count = max(1, len(frame_indices) // segment_frame_spacing)
        segment_count = int(segment_count)
        mask_length = 25
        if max_segments is not None and segment_type != SegmentType.ALL_SECTIONS:
            segment_count = min(max_segments, segment_count)
            mask_length = max(mask_length, len(frame_indices) // segment_count)
        whole_indices = frame_indices
        random_frames = segment_type in (
            SegmentType.IMPORTANT_RANDOM,
            SegmentType.ALL_RANDOM,
            SegmentType.ALL_RANDOM_NOMIN,
            SegmentType.TOP_RANDOM,
            SegmentType.ALL_RANDOM_MASKED,
            None,
        )

        for _ in range(repeats):
            if segment_type == SegmentType.ALL_RANDOM_MASKED:
                segment_indices = np.arange(len(regions))
                all_frames = np.arange(len(regions)) + start_frame
                available_indices = np.full(len(regions), False)
                available_indices[whole_indices - start_frame] = True
            if segment_type != SegmentType.ALL_RANDOM_MASKED or len(whole_indices) < 40:
                frame_indices = whole_indices.copy()
                if random_frames:
                    rng.shuffle(frame_indices)
            for i in range(segment_count):
                if segment_type == SegmentType.ALL_RANDOM_MASKED:
                    if len(whole_indices) < 40:
                        frame_indices = segment_indices[available_indices]
                    else:
                        mask = available_indices.copy()
                        mask_start = i * mask_length
                        mask[mask_start : mask_start + mask_length] = False
                        frame_indices = segment_indices[mask]
                        frame_indices = np.uint32(frame_indices)
                        # reference quirk: module-level np.random here
                        np.random.shuffle(frame_indices)

                if (
                    len(frame_indices) == 0
                    or min_segments is None
                    or len(segments) >= min_segments
                ):
                    if (
                        len(frame_indices) < segment_width / 2.0 and len(segments) > 0
                    ) or len(frame_indices) < segment_width / 4:
                        break

                if segment_type == SegmentType.ALL_SECTIONS:
                    section = frame_indices[: int(segment_width * 2.2)]
                    indices = rng.choice(
                        len(section), min(segment_width, len(section)), replace=False
                    )
                    frames = section[indices]
                    frame_indices = frame_indices[segment_width:]
                elif segment_type == SegmentType.ALL_RANDOM_MASKED:
                    indices = frame_indices[:segment_width]
                    available_indices[indices] = False
                    frames = all_frames[indices]
                elif random_frames:
                    frames = frame_indices[:segment_width]
                    frame_indices = frame_indices[segment_width:]
                else:
                    segment_start = i * segment_frame_spacing
                    segment_end = min(
                        len(frame_indices), segment_start + segment_width
                    )
                    frames = frame_indices[segment_start:segment_end]

                remaining = segment_width - len(frames)
                if remaining > 0:
                    extra_frames = rng.choice(
                        frames, min(remaining, len(frames)), replace=False
                    )
                    frames = np.concatenate([frames, extra_frames])
                frames.sort()
                relative_frames = frames - start_frame
                mass_slice = mass_history[relative_frames]
                segment_mass = np.sum(mass_slice)
                segment_avg_mass = segment_mass / len(mass_slice)
                filtered = False
                if s_min_mass and segment_avg_mass < s_min_mass:
                    if dont_filter:
                        filtered = True
                    else:
                        filtered_stats["segment_mass"] += 1
                        continue
                region_slice = regions[relative_frames]
                if segment_avg_mass < 50:
                    segment_weight_factor = 0.75
                elif segment_avg_mass < 100:
                    segment_weight_factor = 1
                else:
                    segment_weight_factor = 1.2
                if repeat_frame_indices and len(frames) < segment_width:
                    extra_samples = rng.choice(frames, segment_width - len(frames))
                    frames = list(frames)
                    frames.extend(extra_samples)
                    frames.sort()
                segments.append(
                    SegmentHeader(
                        clip_id,
                        track_id,
                        start_frame=start_frame,
                        frames=segment_width,
                        weight=segment_weight_factor,
                        mass=segment_mass,
                        label=label,
                        regions=list(region_slice),
                        frame_indices=np.array(frames),
                        filtered=filtered,
                    )
                )
    return segments, filtered_stats
