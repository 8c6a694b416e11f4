"""HDF5 track database (reference src/ml_tools/trackdatabase.py).

Stores processed clips: background frame, per-track cropped channel frames,
regions, tags, and stats. Layout mirrors the reference (clips/<clip_id>/
<track_id> groups) so existing corpora remain readable. Writes are guarded
by a cross-process file lock like the reference's global HDF5 lock.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import h5py
import numpy as np

try:
    from filelock import FileLock
except ImportError:  # pragma: no cover
    class FileLock:  # type: ignore
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False


special_datasets = [
    "tag_frames", "original_frames", "background_frame", "predictions",
    "overlay",
]


class TrackDatabase:
    def __init__(self, database_filename, read_only=False):
        self.database = Path(database_filename)
        self.read_only = read_only
        self._lock = FileLock(str(self.database) + ".lock")

    def _open(self, mode):
        return h5py.File(self.database, mode)

    def has_clip(self, clip_id):
        with self._lock, self._open("r") as f:
            return str(clip_id) in f.get("clips", {})

    def create_clip(self, clip_id, metadata=None, background=None,
                    overwrite=True):
        with self._lock, self._open("a") as f:
            clips = f.require_group("clips")
            cid = str(clip_id)
            if cid in clips:
                if not overwrite:
                    return
                del clips[cid]
            grp = clips.create_group(cid)
            if background is not None:
                grp.create_dataset(
                    "background_frame", data=background,
                    compression="gzip",
                )
            if metadata:
                for k, v in metadata.items():
                    try:
                        grp.attrs[k] = v
                    except TypeError:
                        grp.attrs[k] = json.dumps(v, default=str)
            grp.attrs["finished"] = True

    def add_track(self, clip_id, track_id, frames, regions, tags=None,
                  start_frame=0, extra_attrs=None):
        """frames: (N, C, h, w) object-free arrays are ragged per region, so
        each frame is stored as its own dataset like the reference."""
        with self._lock, self._open("a") as f:
            clip = f["clips"][str(clip_id)]
            tid = str(track_id)
            if tid in clip:
                del clip[tid]
            grp = clip.create_group(tid)
            grp.attrs["id"] = int(track_id)
            grp.attrs["start_frame"] = int(start_frame)
            grp.attrs["frames"] = len(frames)
            if tags is not None:
                grp.attrs["tags"] = json.dumps(tags, default=str)
            if extra_attrs:
                for k, v in extra_attrs.items():
                    try:
                        grp.attrs[k] = v
                    except TypeError:
                        grp.attrs[k] = json.dumps(v, default=str)
            grp.attrs["regions"] = json.dumps(
                [
                    {
                        "x": r.x, "y": r.y, "width": r.width, "height": r.height,
                        "mass": r.mass, "frame_number": r.frame_number,
                        "blank": bool(r.blank),
                        "pixel_variance": float(r.pixel_variance),
                    }
                    for r in regions
                ]
            )
            for i, frame in enumerate(frames):
                grp.create_dataset(
                    str(i), data=np.asarray(frame), compression="gzip"
                )

    def get_clip_ids(self):
        with self._lock, self._open("r") as f:
            return list(f.get("clips", {}).keys())

    def get_clip_meta(self, clip_id):
        with self._lock, self._open("r") as f:
            grp = f["clips"][str(clip_id)]
            out = dict(grp.attrs)
            for k, v in out.items():
                if isinstance(v, str) and v[:1] in "[{":
                    try:
                        out[k] = json.loads(v)
                    except json.JSONDecodeError:
                        pass
            return out

    def get_clip_background(self, clip_id):
        with self._lock, self._open("r") as f:
            grp = f["clips"][str(clip_id)]
            if "background_frame" in grp:
                return grp["background_frame"][:]
            return None

    def get_track_ids(self, clip_id):
        with self._lock, self._open("r") as f:
            grp = f["clips"][str(clip_id)]
            return [k for k in grp.keys() if k not in special_datasets]

    def get_track(self, clip_id, track_id):
        """Returns (frames list, regions list-of-dicts, attrs)."""
        with self._lock, self._open("r") as f:
            grp = f["clips"][str(clip_id)][str(track_id)]
            n = int(grp.attrs["frames"])
            frames = [grp[str(i)][:] for i in range(n)]
            regions = json.loads(grp.attrs.get("regions", "[]"))
            attrs = dict(grp.attrs)
            if "tags" in attrs:
                attrs["tags"] = json.loads(attrs["tags"])
            return frames, regions, attrs

    def add_predictions(self, clip_id, track_id, predictions: dict):
        """Bulk-add model predictions (reference addpredictions.py flow)."""
        with self._lock, self._open("a") as f:
            grp = f["clips"][str(clip_id)][str(track_id)]
            grp.attrs["predictions"] = json.dumps(predictions, default=float)
