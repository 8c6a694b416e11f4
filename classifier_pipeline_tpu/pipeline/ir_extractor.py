"""IR video track extraction (reference src/track/irtrackextractor.py).

Pipeline: video decode (gated cv2.VideoCapture, or a directory of PNG/PGM
frames for codec-free environments) -> JAX MOG background scan producing
foreground masks -> the tracking scan in IR mode (open/threshold/CCL +
rect merging + IR tracker params) -> host track assembly + trap-line check.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from classifier_pipeline_tpu.track import ir_background, postprocess, tracker_jax
from classifier_pipeline_tpu.track.tracker_jax import TrackingParams

IR_VERSION = 10
IR_FPS = 10


@dataclasses.dataclass
class TrapLine:
    """y = m*x + c boundary (reference irtrackextractor.Line:40-92)."""

    m: float
    c: float

    def is_above(self, point):
        y_res = self.m * point[0] + self.c
        return point[1] > y_res  # image y grows downward


def get_trap_lines(trap_size="L"):
    if trap_size == "S":
        return TrapLine(1.1, 103), TrapLine(-1.1, 823)
    return TrapLine(0.75, 56.5), TrapLine(-0.85, 716.5)


def ir_params(scale=None, max_track_slots=24) -> TrackingParams:
    """IR tracker defaults (reference trackingconfig.py:179-204)."""
    return TrackingParams(
        mode="ir",
        detect_scale=scale or 1.0,
        edge_pixels=0,
        frame_padding=10,
        min_dimension=10,
        denoise=False,
        background_thresh=12.0,
        aoi_min_mass=0.0,
        aoi_pixel_variance=0.0,
        filter_regions_pre_match=False,
        fps=IR_FPS,
        base_distance_change=12000.0,
        min_mass_change=None or 1e9,  # None in reference -> no gate
        mass_change_percent=1e9,
        max_distance=30752.0,
        velocity_multiplier=8.0,
        base_velocity=10.0,
        res_x=640,
        res_y=480,
        max_track_slots=max_track_slots,
        emit_mask=False,
    )


def load_video(path) -> np.ndarray:
    """(T, H, W) uint8 gray frames from an mp4/avi (cv2) or a directory of
    image frames (PIL)."""
    path = Path(path)
    if path.is_dir():
        from PIL import Image

        frames = [
            np.asarray(Image.open(f).convert("L"))
            for f in sorted(path.glob("*.png")) + sorted(path.glob("*.pgm"))
        ]
        if not frames:
            raise ValueError(f"no image frames under {path}")
        return np.stack(frames)
    try:
        import cv2
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "video decode needs cv2 or a directory of frames"
        ) from exc
    cap = cv2.VideoCapture(str(path))
    frames = []
    fails = 0
    while True:
        ok, img = cap.read()
        if not ok:
            if fails < 1:
                fails += 1
                continue
            break
        fails = 0
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


@jax.jit
def _mog_scan(state, frames, learning_rate):
    def step(st, frame):
        st, mask = ir_background.update(st, frame, learning_rate)
        return st, mask

    return jax.lax.scan(step, state, frames)


def _downscale(masks, scale):
    """Area-style downscale of 0/255 masks: any-positive pooling."""
    if scale == 1.0:
        return masks
    f = int(round(1.0 / scale))
    T, H, W = masks.shape
    Hs, Ws = H // f, W // f
    m = masks[:, : Hs * f, : Ws * f].reshape(T, Hs, f, Ws, f)
    return (m.max(axis=(2, 4)) > 127).astype(np.int32) * 255


class IRTrackExtractor:
    VERSION = IR_VERSION
    TYPE = "IR"

    def __init__(self, config=None, scale=0.25, trap_size="L", on_trapped=None,
                 check_trapped=False, keep_frames=True):
        self.config = config or {}
        self.scale = scale
        self.trap_size = trap_size
        self.on_trapped = on_trapped
        self.check_trapped = check_trapped
        self.left_bottom, self.right_bottom = get_trap_lines(trap_size)
        self._clip_id = 0

    def extract(self, path):
        start = time.time()
        frames = load_video(path)
        self._clip_id += 1
        T, H, W = frames.shape
        params = dataclasses.replace(
            ir_params(self.scale), res_x=W, res_y=H
        )
        # background frame heuristic: first frame seeds the model strongly
        mog = ir_background.init_state(frames[0])
        state, masks = _mog_scan(
            mog, jnp.asarray(frames.astype(np.float32)), -1.0
        )
        masks = np.asarray(masks)
        scaled = _downscale(masks, self.scale)
        rows, carry = self._track(params, frames, scaled)
        tracks = postprocess.assemble_tracks(rows, fps=IR_FPS)
        filter_cfg = {
            "track_min_delta": 1.0,
            "track_max_delta": 150,
            "track_min_offset": 20,
            "min_duration_secs": 0,
        }
        good, filtered = postprocess.filter_tracks(tracks, params, filter_cfg)
        if self.check_trapped:
            for t in good:
                self.update_trap_state(t)
        meta = {
            "camera_model": "IR",
            "background_thresh": 12,
            "num_frames": int(T),
            "id": self._clip_id,
            "tracks": [t.get_metadata(f"IR-{IR_VERSION}") for t in good],
            "source": str(path),
            "tracking_time": round(time.time() - start, 1),
            "algorithm": {
                "tracker_version": f"IR-{IR_VERSION}",
                "tracker_config": dataclasses.asdict(params),
            },
        }
        return meta, good, filtered

    @staticmethod
    def _track(params, frames, scaled_masks):
        carry = tracker_jax.init_carry(params, frames[0])
        step = tracker_jax.make_scan_step(params)

        @jax.jit
        def run(carry, gray, masks, ffc):
            return jax.lax.scan(step, carry, (gray, masks, ffc))

        carry, rows = run(
            carry,
            jnp.asarray(frames.astype(np.int32)),
            jnp.asarray(scaled_masks.astype(np.int32)),
            jnp.zeros((frames.shape[0],), jnp.bool_),
        )
        return jax.device_get(rows), jax.device_get(carry)

    def update_trap_state(self, track, min_frames=2):
        """reference Track.update_trapped_state + inside_trap_top."""
        if len(track.bounds) < min_frames:
            return False
        inside = 0
        for b in track.bounds[-min_frames:]:
            mid = (b.x + b.width / 2, b.y + b.height / 2)
            if self.left_bottom.is_above(mid) and self.right_bottom.is_above(mid):
                inside += 1
        trapped = inside == min_frames
        if trapped and self.on_trapped is not None:
            self.on_trapped(track)
        track.in_trap = trapped
        return trapped
