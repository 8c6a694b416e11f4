"""Frame, FrameCache (HDF5 spill) and FrameBuffer.

Port of reference src/ml_tools/framecache.py and src/track/framebuffer.py:
the low-memory path spills per-frame channel stacks (thermal / filtered /
clipped flow / mask) to an HDF5 sidecar ``<clip>.cache``; the in-memory path
keeps a ring of the last ``max_frames`` frames. Optical flow, when enabled,
is our JAX TV-L1 (ops/flow.py) instead of cv2 DualTVL1
(reference framebuffer.py:54-66).

The tracking hot path does NOT use this (the whole clip lives in device
arrays, CLAUDE.md architecture invariants); it serves the host-side consumers
that want random access to past frames — previews, thumbnails, IR classify
(reference kerasmodel.classify_ir uses frame_buffer.get_frame), and cache
mode for memory-constrained batch runs.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from threading import Lock

import numpy as np


class TrackChannels(enum.Enum):
    """reference frame.TrackChannels (:9-17)."""

    thermal = 0
    filtered = 1
    flow_h = 2
    flow_v = 3
    mask = 4
    flow = 5


def get_clipped_flow(flow):
    """reference tools.get_clipped_flow (:189-190)."""
    return np.clip(flow * 256, -16000, 16000)


@dataclasses.dataclass
class Frame:
    """Host-side frame record (reference ml_tools/frame.py subset)."""

    thermal: np.ndarray
    filtered: np.ndarray
    frame_number: int
    mask: np.ndarray | None = None
    flow: np.ndarray | None = None  # (H, W, 2)
    flow_clipped: bool = False
    ffc_affected: bool = False
    scaled_thermal: np.ndarray | None = None

    def unclip_flow(self):
        if self.flow_clipped and self.flow is not None:
            self.flow = self.flow * (1.0 / 256.0)
            self.flow_clipped = False

    def generate_optical_flow(self, prev_frame):
        """reference frame.generate_optical_flow (:143-165) on the JAX TV-L1."""
        import jax.numpy as jnp

        from classifier_pipeline_tpu.ops.flow import flow_input, tvl1_flow

        mask = self.mask if self.mask is not None else np.ones_like(self.thermal)
        scaled = np.asarray(flow_input(jnp.asarray(self.thermal), jnp.asarray(mask)))
        if prev_frame is not None and prev_frame.scaled_thermal is not None:
            self.flow = np.asarray(
                tvl1_flow(
                    jnp.asarray(prev_frame.scaled_thermal), jnp.asarray(scaled)
                )
            )
        else:
            self.flow = np.zeros(self.thermal.shape + (2,), np.float32)
        self.scaled_thermal = scaled
        if prev_frame is not None:
            prev_frame.scaled_thermal = None

    @classmethod
    def from_channels(cls, data, channels, frame_number, flow_clipped=False,
                      ffc_affected=False):
        chans = [TrackChannels(int(c)) for c in channels]
        arr = {c: None for c in TrackChannels}
        i = 0
        for c in chans:
            if c == TrackChannels.flow:
                flow = np.stack([data[i], data[i + 1]], axis=-1)
                arr[TrackChannels.flow] = flow
                i += 2
            else:
                arr[c] = np.array(data[i])
                i += 1
        return cls(
            thermal=arr[TrackChannels.thermal],
            filtered=arr[TrackChannels.filtered],
            frame_number=frame_number,
            mask=arr[TrackChannels.mask],
            flow=arr[TrackChannels.flow],
            flow_clipped=flow_clipped,
            ffc_affected=ffc_affected,
        )


class FrameCache:
    """HDF5 sidecar spill (reference framecache.py, same group layout)."""

    def __init__(self, cptv_name, keep_open=True, delete_if_exists=True):
        import h5py

        basename = os.path.splitext(str(cptv_name))[0]
        self.filename = basename + ".cache"
        self.db = None
        self.keep_open = keep_open
        if delete_if_exists:
            self.delete()
        f = h5py.File(self.filename, "w")
        f.create_group("frames")
        f.close()

    def add_frame(self, frame: Frame):
        self.open()
        frames = self.db["frames"]
        g = frames.create_group(str(frame.frame_number))
        g.attrs["ffc_affected"] = frame.ffc_affected
        shaped = next(
            (a for a in (frame.thermal, frame.filtered, frame.mask, frame.flow)
             if a is not None),
            None,
        )
        if shaped is None:
            raise ValueError("frame has no channels to cache")
        height, width = shaped.shape[:2]
        channels, data = [], []
        if frame.thermal is not None:
            channels.append(TrackChannels.thermal.value)
            data.append(np.float32(frame.thermal))
        if frame.filtered is not None:
            channels.append(TrackChannels.filtered.value)
            data.append(np.float32(frame.filtered))
        if frame.flow is not None:
            channels.append(TrackChannels.flow.value)
            scaled = get_clipped_flow(frame.flow)
            data.append(np.float32(scaled[:, :, 0]))
            data.append(np.float32(scaled[:, :, 1]))
        if frame.mask is not None:
            channels.append(TrackChannels.mask.value)
            data.append(np.float32(frame.mask))
        g.attrs["channels"] = np.uint8(channels)
        node = g.create_dataset(
            "frame", (len(data), height, width), chunks=(1, height, width),
            dtype=np.float32,
        )
        node[:, :, :] = data
        if not self.keep_open:
            self.close()

    def get_frame(self, frame_number):
        self.open()
        frame = None
        if str(frame_number) in self.db["frames"]:
            g = self.db["frames"][str(frame_number)]
            frame = Frame.from_channels(
                g["frame"][:],
                g.attrs["channels"],
                frame_number,
                flow_clipped=True,
                ffc_affected=bool(g.attrs["ffc_affected"]),
            )
        if not self.keep_open:
            self.close()
        return frame

    def close(self):
        if self.db:
            self.db.close()
            self.db = None

    def open(self, mode="a"):
        if not self.db:
            import h5py

            self.db = h5py.File(self.filename, mode)

    def delete(self):
        if self.db:
            self.close()
        if os.path.exists(self.filename):
            os.remove(self.filename)


class FrameBuffer:
    """reference track/framebuffer.py: ring or HDF5-spill frame store with
    optional per-frame optical flow."""

    def __init__(self, cptv_name, cache_to_disk=False, calc_flow=False,
                 keep_frames=True, max_frames=None, high_quality_flow=False):
        self.cache = FrameCache(cptv_name) if cache_to_disk else None
        self.calc_flow = calc_flow
        self.high_quality_flow = high_quality_flow
        self.max_frames = max_frames
        self.keep_frames = True if max_frames and max_frames > 0 else keep_frames
        self.frames: list[Frame] = []
        self.frames_by_frame_number: dict[int, Frame] = {}
        self.prev_frame: Frame | None = None
        self.current_frame: Frame | None = None
        self.frame_lock = Lock()

    def add_frame(self, thermal, filtered, mask, frame_number,
                  ffc_affected=False) -> Frame:
        self.prev_frame = self.current_frame
        frame = Frame(
            thermal=thermal, filtered=filtered, frame_number=frame_number,
            mask=mask, ffc_affected=ffc_affected,
        )
        self.current_frame = frame
        if self.calc_flow:
            frame.generate_optical_flow(self.prev_frame)
        if self.keep_frames:
            if self.cache:
                self.cache.add_frame(frame)
            else:
                with self.frame_lock:
                    if self.max_frames and len(self.frames) == self.max_frames:
                        del self.frames_by_frame_number[
                            self.frames[0].frame_number
                        ]
                        del self.frames[0]
                    self.frames.append(frame)
                    self.frames_by_frame_number[frame.frame_number] = frame
        return frame

    @property
    def has_flow(self):
        return bool(self.cache or self.calc_flow)

    def get_frame(self, frame_number):
        if frame_number in self.frames_by_frame_number:
            return self.frames_by_frame_number[frame_number]
        if self.prev_frame and self.prev_frame.frame_number == frame_number:
            return self.prev_frame
        if self.current_frame and self.current_frame.frame_number == frame_number:
            return self.current_frame
        if self.cache:
            return self.cache.get_frame(frame_number)
        return None

    def get_last_x(self, x):
        return self.frames[-x:] if self.frames else []

    def close_cache(self):
        if self.cache:
            self.cache.close()

    def remove_cache(self):
        if self.cache:
            self.cache.delete()
