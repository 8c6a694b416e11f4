"""Host-side track assembly from the device scan's per-frame rows.

The device scan (tracker_jax.py) emits one row per track slot per frame; this
module turns those into per-track bounds histories and reproduces the
reference's post-pass exactly: trim, movement statistics, score, filtering,
ordering (reference src/track/track.py:737-905, src/track/cliptracker.py:367-486).
All arithmetic here is on tiny per-track lists — it stays on host by design.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np

from .tracker_jax import TrackingParams

JITTER_THRESHOLD = 0.3
MIN_JITTER_CHANGE = 5


@dataclasses.dataclass
class RegionRow:
    x: int
    y: int
    width: int
    height: int
    mass: int
    frame_number: int
    pixel_variance: float
    blank: bool
    centroid: tuple[float, float]
    is_along_border: bool
    in_trap: bool = False
    # device-computed thumbnail stats (0/nan when unavailable)
    contours: int = 0
    median_raw: float = float("nan")

    @property
    def right(self):
        return self.x + self.width

    @property
    def bottom(self):
        return self.y + self.height

    @property
    def area(self):
        return self.width * self.height

    @property
    def mid(self):
        return (self.x + self.width / 2, self.y + self.height / 2)

    def has_moved(self, other: "RegionRow") -> bool:
        return (self.x != other.x and self.right != other.right) or (
            self.y != other.y and self.bottom != other.bottom
        )

    def meta_dict(self):
        # reference Rectangle.meta_dictionary drops centroid/id/border flags
        return {
            "x": self.x,
            "y": self.y,
            "width": self.width,
            "height": self.height,
            "mass": self.mass,
            "frame_number": self.frame_number,
            "pixel_variance": round(float(self.pixel_variance), 2),
            "blank": bool(self.blank),
            "in_trap": bool(self.in_trap),
        }


@dataclasses.dataclass
class TrackStats:
    movement: float = 0.0
    max_offset: float = 0.0
    score: float = 0.0
    average_mass: float = 0.0
    median_mass: float = 0.0
    delta_std: float = 0.0
    region_jitter: int = 0
    jitter_smaller: int = 0
    jitter_bigger: int = 0
    blank_percent: int = 0
    frames_moved: int = 0
    mass_std: float = 0.0
    average_velocity: float = 0.0


@dataclasses.dataclass
class AssembledTrack:
    track_id: int
    start_frame: int
    bounds: list  # list[RegionRow]
    vel_x: list
    vel_y: list
    blank_frames: int  # tracker counter
    fsts: int  # frames_since_target_seen at end
    fps: float = 9.0
    stats: Optional[TrackStats] = None
    start_s: float = 0.0
    end_s: Optional[float] = None
    filtered_reason: Optional[str] = None

    def __len__(self):
        return len(self.bounds)

    @property
    def end_frame(self):
        if not self.bounds:
            return self.start_frame
        return self.bounds[-1].frame_number

    @property
    def frames(self):
        return self.end_frame + 1 - self.start_frame

    def trim(self):
        """reference Track.trim (track.py:873-905)."""
        mass = [int(b.mass) for b in self.bounds]
        median_mass = float(np.median(mass)) if mass else 0.0
        filter_mass = max(0.005 * median_mass, 2)
        start = 0
        while start < len(self.bounds) and mass[start] <= filter_mass:
            start += 1
        end = len(self.bounds) - 1
        while end > 0 and mass[end] <= filter_mass:
            if self.fsts > 0:
                self.fsts -= 1
                self.blank_frames -= 1
            end -= 1
        if end < start:
            self.bounds = []
            self.vel_x = []
            self.vel_y = []
            self.blank_frames = 0
        else:
            self.start_frame += start
            self.bounds = self.bounds[start : end + 1]
            self.vel_x = self.vel_x[start : end + 1]
            self.vel_y = self.vel_y[start : end + 1]
        self.start_s = self.start_frame / float(self.fps)

    def set_end_s(self, fps):
        if len(self.bounds) == 0:
            self.end_s = self.start_s
        else:
            self.end_s = (self.end_frame + 1) / fps

    def calculate_stats(self):
        """reference Track.calculate_stats (track.py:737-833), bit-faithful."""
        if len(self) <= 1:
            self.stats = TrackStats()
            return
        non_blank = [b for b in self.bounds if not b.blank]
        mass_history = [int(b.mass) for b in non_blank]
        variance_history = [
            b.pixel_variance for b in non_blank if b.pixel_variance
        ]
        movement = 0.0
        max_offset = 0.0
        frames_moved = 0
        avg_vel = 0.0
        first_point = self.bounds[0].mid
        for i, (vx, vy) in enumerate(zip(self.vel_x, self.vel_y)):
            region = self.bounds[i]
            if not region.blank:
                avg_vel += abs(vx) + abs(vy)
            if i == 0:
                continue
            if region.blank or self.bounds[i - 1].blank:
                continue
            if region.has_moved(self.bounds[i - 1]) or region.is_along_border:
                distance = (vx**2 + vy**2) ** 0.5
                movement += distance
                dx = first_point[0] - region.mid[0]
                dy = first_point[1] - region.mid[1]
                offset = dx * dx + dy * dy
                max_offset = max(max_offset, offset)
                frames_moved += 1
        avg_vel = avg_vel / len(mass_history)
        max_offset = math.sqrt(max_offset)
        delta_std = (
            float(np.mean(variance_history)) ** 0.5 if variance_history else 0.0
        )
        jitter_bigger = 0
        jitter_smaller = 0
        for i, bound in enumerate(self.bounds[1:]):
            prev_bound = self.bounds[i]
            if prev_bound.is_along_border or bound.is_along_border:
                continue
            height_diff = bound.height - prev_bound.height
            width_diff = prev_bound.width - bound.width
            thresh_h = max(MIN_JITTER_CHANGE, prev_bound.height * JITTER_THRESHOLD)
            thresh_v = max(MIN_JITTER_CHANGE, prev_bound.width * JITTER_THRESHOLD)
            if abs(height_diff) > thresh_h:
                if height_diff > 0:
                    jitter_bigger += 1
                else:
                    jitter_smaller += 1
            elif abs(width_diff) > thresh_v:
                if width_diff > 0:
                    jitter_bigger += 1
                else:
                    jitter_smaller += 1

        movement_points = (movement**0.5) + max_offset
        delta_points = delta_std * 25.0
        jitter_percent = int(
            round(100 * (jitter_bigger + jitter_smaller) / float(self.frames))
        )
        blank_percent = int(round(100.0 * self.blank_frames / self.frames))
        score = (
            min(movement_points, 100)
            + min(delta_points, 100)
            + (100 - jitter_percent)
            + (100 - blank_percent)
        )
        self.stats = TrackStats(
            movement=float(movement),
            max_offset=float(max_offset),
            average_mass=float(np.mean(mass_history)),
            median_mass=float(np.median(mass_history)),
            delta_std=float(delta_std),
            score=float(score),
            region_jitter=jitter_percent,
            jitter_bigger=jitter_bigger,
            jitter_smaller=jitter_smaller,
            blank_percent=blank_percent,
            frames_moved=frames_moved,
            mass_std=float(np.std(mass_history)),
            average_velocity=float(avg_vel),
        )

    def get_metadata(self, tracker_version=11):
        start_s = self.start_s
        end_s = self.end_s if self.end_s is not None else (self.end_frame + 1) / self.fps
        return {
            "id": self.track_id,
            "tracker_version": tracker_version,
            "start_s": round(start_s, 2),
            "end_s": round(end_s, 2),
            "num_frames": len(self),
            "frame_start": self.start_frame,
            "frame_end": self.end_frame,
            "positions": [b.meta_dict() for b in self.bounds],
            "tracking_score": 0 if self.stats is None else self.stats.score,
        }


def assemble_tracks(rows, fps: float = 9.0) -> list[AssembledTrack]:
    """Build AssembledTracks from stacked FrameRows (numpy-ified)."""
    emitted = np.asarray(rows.emitted)  # (T, K)
    T, K = emitted.shape
    blank = np.asarray(rows.blank)
    x = np.asarray(rows.x)
    y = np.asarray(rows.y)
    w = np.asarray(rows.w)
    h = np.asarray(rows.h)
    mass = np.asarray(rows.mass)
    cent = np.asarray(rows.cent)
    var = np.asarray(rows.variance)
    border = np.asarray(rows.border)
    contours = np.asarray(rows.contours)
    median_raw = np.asarray(rows.median_raw)

    tracks = []
    for k in range(K):
        ts = np.nonzero(emitted[:, k])[0]
        if ts.size == 0:
            continue
        # slots are used for exactly one contiguous run
        t0, t1 = int(ts[0]), int(ts[-1])
        bounds = []
        vel_x, vel_y = [], []
        blank_count = 0
        prev_cent = None
        for t in range(t0, t1 + 1):
            if not emitted[t, k]:
                break  # safety: run should be contiguous
            r = RegionRow(
                x=int(x[t, k]), y=int(y[t, k]), width=int(w[t, k]),
                height=int(h[t, k]), mass=int(mass[t, k]), frame_number=int(t),
                pixel_variance=float(var[t, k]), blank=bool(blank[t, k]),
                centroid=(float(cent[t, k, 0]), float(cent[t, k, 1])),
                is_along_border=bool(border[t, k]),
                contours=int(contours[t, k]),
                median_raw=float(median_raw[t, k]),
            )
            bounds.append(r)
            if prev_cent is None:
                vel_x.append(0)
                vel_y.append(0)
            else:
                vel_x.append(r.centroid[0] - prev_cent[0])
                vel_y.append(r.centroid[1] - prev_cent[1])
            prev_cent = r.centroid
            if r.blank:
                blank_count += 1
        # trailing blank run = frames_since_target_seen at end
        fsts = 0
        for b in reversed(bounds):
            if b.blank:
                fsts += 1
            else:
                break
        tracks.append(
            AssembledTrack(
                track_id=k + 1,  # provisional; fixed below by creation order
                start_frame=t0,
                bounds=bounds,
                vel_x=vel_x,
                vel_y=vel_y,
                blank_frames=blank_count,
                fsts=fsts,
                fps=fps,
                start_s=t0 / fps,
            )
        )
    # ids by creation order (start frame, then slot order which matches
    # allocation order)
    tracks.sort(key=lambda tr: (tr.start_frame, tr.track_id))
    for i, tr in enumerate(tracks):
        tr.track_id = i + 1
    return tracks


def filter_tracks(tracks: list[AssembledTrack], p: TrackingParams, config=None):
    """reference ClipTracker.filter_tracks + filter_track
    (cliptracker.py:367-486). Returns (good, filtered) with good sorted by
    score descending."""
    cfg = config or {}
    min_duration_secs = cfg.get("min_duration_secs", 0)
    track_min_offset = cfg.get("track_min_offset", 4.0)
    min_moving_frames = cfg.get("min_moving_frames", 2)
    max_blank_percent = cfg.get("max_blank_percent", 30)
    max_jitter = cfg.get("max_jitter", 20)
    track_min_delta = cfg.get("track_min_delta", 1.0)
    track_max_delta = cfg.get("track_max_delta", 150)
    track_min_mass = cfg.get("track_min_mass", 2.0)
    max_tracks = cfg.get("max_tracks")

    for tr in tracks:
        tr.trim()
        tr.set_end_s(tr.fps)
        tr.calculate_stats()
    tracks = sorted(tracks, key=lambda t: t.stats.score, reverse=True)
    good, filtered = [], []
    for tr in tracks:
        s = tr.stats
        if len(tr) < min_duration_secs * tr.fps:
            tr.filtered_reason = "Track filtered.  Too short"
        elif s.max_offset < track_min_offset or s.frames_moved < min_moving_frames:
            tr.filtered_reason = "Track filtered.  Didn't move"
        elif s.blank_percent > max_blank_percent:
            tr.filtered_reason = "Track filtered. Too Many Blanks"
        elif s.region_jitter > max_jitter:
            tr.filtered_reason = "Track filtered.  Too Jittery"
        elif s.delta_std < track_min_delta:
            tr.filtered_reason = "Track filtered.  Too static"
        elif s.delta_std > track_max_delta:
            tr.filtered_reason = "Track filtered.  Too Dynamic"
        elif s.average_mass < track_min_mass:
            tr.filtered_reason = "Track filtered.  Mass too small"
        if tr.filtered_reason:
            filtered.append(tr)
        else:
            good.append(tr)
    if max_tracks is not None and max_tracks < len(good):
        for tr in good[max_tracks:]:
            tr.filtered_reason = "Too many tracks"
        filtered.extend(good[max_tracks:])
        good = good[:max_tracks]
    return good, filtered
