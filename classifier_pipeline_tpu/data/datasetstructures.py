"""Dataset structures (reference src/ml_tools/datasetstructures.py):
TrackHeader with mass quartiles + sample-frame selection, ClipHeader,
FrameSample, SampleBase."""

from __future__ import annotations

import dataclasses
from datetime import datetime
from typing import Optional

import numpy as np

from .segments import SegmentHeader, SegmentType, get_segments  # re-export

CROP_RECT = (1, 1, 160 - 2, 120 - 2)


@dataclasses.dataclass
class FrameSample:
    clip_id: int
    track_id: int
    frame_number: int
    label: str
    region: object
    source_file: object = None
    weight: float = 1
    station_id: object = None
    track_median_mass: float = 0
    augment: bool = False

    @property
    def id(self):
        return f"{self.clip_id}-{self.track_id}-{self.frame_number}"

    @property
    def bin_id(self):
        return f"{self.clip_id}-{self.track_id}"

    @property
    def unique_id(self):
        return self.id

    @property
    def frame_numbers(self):
        return [self.frame_number]

    @property
    def mass(self):
        return self.region.mass

    def copy(self):
        return dataclasses.replace(self)


class TrackHeader:
    """Track metadata + mass statistics (reference datasetstructures.py:140-330)."""

    def __init__(self, clip_id, track_id, label, num_frames, regions, start_frame,
                 ffc_frames=None, station_id=None, start_time=None,
                 source_file=None, camera=None, confidence=None, human_tags=None,
                 remapped_lbl=None, mega_missed_regions=None, skip_ffc=True,
                 fp_frames=None):
        self.fp_frames = fp_frames
        self.start_time = start_time
        self.mega_missed_regions = mega_missed_regions
        self.station_id = station_id
        self.clip_id = clip_id
        self.source_file = source_file
        self.human_tags = human_tags
        self.confidence = confidence
        self.filtered_stats = {"segment_mass": 0}
        self.track_id = track_id
        self.start_frame = int(start_frame)
        self.original_label = label
        self.remapped_label = remapped_lbl
        self.regions_by_frame = regions  # {frame_number: RegionRow-like}
        self.num_frames = num_frames
        self.camera = camera
        mass_history = [
            r.mass
            for r in regions.values()
            if r.mass > 0
            and (ffc_frames is None or not skip_ffc or r.frame_number not in ffc_frames)
            and not r.blank
            and r.width > 0
            and r.height > 0
        ]
        self.has_no_mass = np.sum(mass_history) == 0
        if len(mass_history) == 0:
            self.lower_mass = self.upper_mass = self.median_mass = self.mean_mass = 0
        else:
            self.lower_mass = int(np.percentile(mass_history, q=25))
            self.upper_mass = int(np.percentile(mass_history, q=75))
            self.median_mass = int(np.median(mass_history))
            self.mean_mass = int(np.mean(mass_history))
        self.samples = []

    @property
    def label(self):
        return self.original_label if self.remapped_label is None else self.remapped_label

    @property
    def bin_id(self):
        return f"{self.clip_id}-{self.track_id}"

    @property
    def bounds_history(self):
        return sorted(self.regions_by_frame.values(), key=lambda r: r.frame_number)

    def calculate_sample_frames(self, min_mass=None, max_mass=None, ffc_frames=None,
                                skip_last=None, max_frames=None):
        """Quartile-filtered per-frame samples (reference :255-326)."""
        cx, cy, cw, ch = CROP_RECT
        frame_numbers = sorted(self.regions_by_frame.keys())
        if skip_last is not None:
            skip_x = int(len(frame_numbers) * skip_last)
            frame_numbers = frame_numbers[: len(frame_numbers) - skip_x]
        previous_mass = None
        for fn in frame_numbers:
            r = self.regions_by_frame[fn]
            if r.mass == 0 or r.blank or r.width <= 0 or r.height <= 0:
                continue
            if ffc_frames is not None and fn in ffc_frames:
                continue
            if self.mega_missed_regions is not None and fn in self.mega_missed_regions:
                continue
            if min_mass is not None and r.mass < min_mass:
                continue
            if max_mass is not None and r.mass > max_mass:
                continue
            on_border = (
                r.x <= cx or r.y <= cy
                or r.x + r.width >= cw or r.y + r.height >= ch
            )
            if on_border:
                if previous_mass is not None:
                    if abs(previous_mass - r.mass) >= previous_mass * 0.1:
                        continue
            else:
                previous_mass = r.mass
            self.samples.append(
                FrameSample(
                    self.clip_id, self.track_id, r.frame_number, self.label, r,
                    source_file=self.source_file, weight=1,
                    station_id=self.station_id,
                    track_median_mass=self.median_mass,
                )
            )
        if max_frames is not None and len(self.samples) > max_frames:
            self.samples = list(
                np.random.choice(self.samples, max_frames, replace=False)
            )

    def get_segments(self, segment_width=25, segment_frame_spacing=9,
                     segment_types=(SegmentType.ALL_RANDOM_MASKED,),
                     segment_min_mass=None, ffc_frames=None, repeats=1,
                     max_segments=None, dont_filter=False, skip_ffc=True,
                     min_mass=None, filter_by_fp=False, seed=None):
        segments, stats = get_segments(
            self.clip_id,
            self.track_id,
            self.start_frame,
            self.bounds_history,
            segment_width=segment_width,
            segment_frame_spacing=segment_frame_spacing,
            label=self.label,
            segment_min_mass=segment_min_mass,
            ffc_frames=ffc_frames,
            repeats=repeats,
            segment_types=list(segment_types),
            max_segments=max_segments,
            dont_filter=dont_filter,
            skip_ffc=skip_ffc,
            frame_min_mass=min_mass,
            fp_frames=self.fp_frames if filter_by_fp else None,
            seed=seed,
        )
        for s in segments:
            s.station_id = self.station_id
            s.source_file = self.source_file
            s.track_median_mass = self.median_mass
        self.filtered_stats["segment_mass"] += stats.get("segment_mass", 0)
        return segments


@dataclasses.dataclass
class ClipHeader:
    clip_id: int
    source_file: object
    tracks: list
    station_id: object = None
    location: Optional[tuple] = None
    camera: object = None
    rec_time: Optional[datetime] = None
    frames_per_second: int = 9
    ffc_frames: list = dataclasses.field(default_factory=list)
    country_code: Optional[str] = None
    events: str = ""
    trap: str = ""
