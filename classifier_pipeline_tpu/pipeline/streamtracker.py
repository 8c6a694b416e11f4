"""Streaming tracker: the batch scan's step function driven one frame at a
time with device-resident state (reference ClipTrackExtractor.process_frame
as used by the Pi runtime, src/piclassifier/piclassifier.py:968).

The motion detector owns the WeightedBackground; each step receives it as an
input (params.external_background=True). Track history accumulates host-side
incrementally so the classifier cascade can read bounds immediately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from classifier_pipeline_tpu.track import tracker_jax
from classifier_pipeline_tpu.track.postprocess import AssembledTrack, RegionRow
from classifier_pipeline_tpu.track.tracker_jax import TrackingParams


@functools.partial(jax.jit, static_argnames=("params",))
def _stream_step(params, carry, thermal, bg, avg_num, avg_den, ffc):
    step = tracker_jax.make_scan_step(params)
    return step(carry, (thermal, bg, avg_num, avg_den, ffc))


@functools.partial(jax.jit, static_argnames=("params",))
def _ir_stream_step(params, carry, gray, fg_mask, ffc):
    step = tracker_jax.make_scan_step(params)
    return step(carry, (gray, fg_mask, ffc))


class StreamTrack(AssembledTrack):
    """Live track with incremental bounds; provides the attributes the
    cascade uses (last_bound, received_at)."""

    received_at = None

    @property
    def last_bound(self):
        return self.bounds[-1] if self.bounds else None

    @property
    def last_mass(self):
        return self.bounds[-1].mass if self.bounds else 0


class StreamingTracker:
    def __init__(self, params: TrackingParams, fps: float = 9.0):
        assert params.external_background
        self.params = params
        self.fps = fps
        self.carry = None
        self.tracks: dict[int, StreamTrack] = {}  # slot -> track
        self.active_slots: set[int] = set()
        self.current_frame = -1
        self.frames = []  # per-frame FrameRows (numpy) if needed

    def warmup(self):
        """Compile (or load from the persistent cache, where serializable)
        the streaming step + row fetch before any frame arrives. A live
        deployment pays this at service start — the reference likewise loads
        models before the camera handshake — so replay fps reflects the
        steady state. State is untouched: a scratch carry is used."""
        H, W = self.params.res_y, self.params.res_x
        carry = tracker_jax.init_carry(self.params, np.zeros((H, W), np.uint16))
        _, rows = _stream_step(
            self.params, carry,
            np.zeros((H, W), np.int32), np.zeros((H, W), np.float32),
            np.int32(0), np.int32(1), np.bool_(False),
        )
        tracker_jax.fetch_rows(rows)

    def start_clip(self):
        self.carry = tracker_jax.init_carry(
            self.params, np.zeros((self.params.res_y, self.params.res_x), np.uint16)
        )
        self.tracks = {}
        self.active_slots = set()
        self.current_frame = -1

    def process_frame(self, pix, background, avg_num, avg_den, ffc):
        """Track one frame. background: (H,W) float array of ints;
        avg_num/avg_den: the background average as a rational (int average ->
        den=1). Returns (new_tracks, rows)."""
        self.carry, rows = _stream_step(
            self.params,
            self.carry,
            np.asarray(pix, np.int32),
            np.asarray(background, np.float32),
            np.int32(avg_num),
            np.int32(avg_den),
            np.bool_(ffc),
        )
        rows = tracker_jax.fetch_rows(rows)
        self.current_frame += 1
        new_tracks = self._update_tracks(rows)
        return new_tracks, rows

    def _update_tracks(self, rows):
        emitted = np.asarray(rows.emitted)
        t = self.current_frame
        new_tracks = []
        now_active = set()
        for k in np.nonzero(emitted)[0]:
            k = int(k)
            r = RegionRow(
                x=int(rows.x[k]), y=int(rows.y[k]), width=int(rows.w[k]),
                height=int(rows.h[k]), mass=int(rows.mass[k]), frame_number=t,
                pixel_variance=float(rows.variance[k]),
                blank=bool(rows.blank[k]),
                centroid=(float(rows.cent[k, 0]), float(rows.cent[k, 1])),
                is_along_border=bool(rows.border[k]),
            )
            track = self.tracks.get(k)
            if track is None:
                track = StreamTrack(
                    track_id=len(self.tracks) + 1,
                    start_frame=t,
                    bounds=[],
                    vel_x=[],
                    vel_y=[],
                    blank_frames=0,
                    fsts=0,
                    fps=self.fps,
                    start_s=t / self.fps,
                )
                self.tracks[k] = track
                new_tracks.append(track)
            if track.bounds:
                track.vel_x.append(r.centroid[0] - track.bounds[-1].centroid[0])
                track.vel_y.append(r.centroid[1] - track.bounds[-1].centroid[1])
            else:
                track.vel_x.append(0)
                track.vel_y.append(0)
            track.bounds.append(r)
            if r.blank:
                track.blank_frames += 1
                track.fsts += 1
            else:
                track.fsts = 0
            now_active.add(k)
        # carry.slots.active reflects post-frame state
        active = np.asarray(self.carry.slots.active)
        self.active_slots = {int(k) for k in np.nonzero(active)[0]}
        return new_tracks

    @property
    def active_tracks(self):
        return [self.tracks[k] for k in self.active_slots if k in self.tracks]

    def all_tracks(self):
        return list(self.tracks.values())


class IRStreamingTracker(StreamingTracker):
    """IR variant: the step consumes (gray, foreground mask, ffc) — the MOG
    background lives in the motion detector, the mask is its per-frame
    output (reference IRTrackExtractor streaming via start_tracking,
    irtrackextractor.py; mask downscale mirrors scale=0.25 on the Pi)."""

    def __init__(self, params: TrackingParams, fps: float = 10.0):
        # bypass the external_background assert: IR keeps bg in the detector
        assert params.mode == "ir"
        self.params = params
        self.fps = fps
        self.carry = None
        self.tracks = {}
        self.active_slots = set()
        self.current_frame = -1
        self.frames = []

    def _scaled(self, mask):
        from classifier_pipeline_tpu.pipeline.ir_extractor import _downscale

        mask = np.asarray(mask, np.int32)
        return _downscale(mask[None], self.params.detect_scale)[0]

    def warmup(self):
        H, W = self.params.res_y, self.params.res_x
        s = self.params.detect_scale
        Hs, Ws = (int(H * s), int(W * s)) if s != 1.0 else (H, W)
        carry = tracker_jax.init_carry(self.params, np.zeros((H, W), np.uint16))
        _, rows = _ir_stream_step(
            self.params, carry,
            np.zeros((H, W), np.int32), np.zeros((Hs, Ws), np.int32),
            np.bool_(False),
        )
        tracker_jax.fetch_rows(rows)

    def process_frame(self, pix, fg_mask, ffc=False):
        self.carry, rows = _ir_stream_step(
            self.params,
            self.carry,
            np.asarray(pix, np.int32),
            self._scaled(fg_mask),
            np.bool_(ffc),
        )
        rows = tracker_jax.fetch_rows(rows)
        self.current_frame += 1
        new_tracks = self._update_tracks(rows)
        return new_tracks, rows
