"""Example dbus client consuming the recorder's tracking signals
(reference src/piclassifier/dbuslistener.py).

Subscribes to org.cacophony.thermalrecorder Tracking / TrackFiltered /
Recording / TrackingReprocessed signals and logs them; also demonstrates the
ClassificationLabels method call. dbus-python + GLib are host-side optional
dependencies (same as the reference's Pi runtime); without them this module
exits with a clear message.
"""

from __future__ import annotations

import logging
import sys
from datetime import datetime

DBUS_NAME = "org.cacophony.thermalrecorder"
DBUS_PATH = "/org/cacophony/thermalrecorder"

model_labels: list = []
active_tracks: dict = {}


def tracking(clip_id, track_id, prediction, what, confidence, region, frame,
             mass, blank, is_tracking, last_prediction_frame, model_id,
             tracking_start_time):
    start = datetime.fromtimestamp(tracking_start_time / 1000)
    logging.info(
        "Tracking: clip %s track %s predicted %s (%s%%) tracking=%s region %s "
        "frame %s mass %s started %s",
        clip_id, track_id, what, confidence, is_tracking, region, frame, mass,
        start,
    )
    if is_tracking:
        active_tracks[track_id] = (what, confidence)
    else:
        active_tracks.pop(track_id, None)


def track_filtered(track_id):
    logging.info("TrackFiltered: %s", track_id)
    active_tracks.pop(track_id, None)


def recording(received_at, started):
    logging.info("Recording signal: started=%s at %s", started, received_at)


def reprocessed(clip_id, tracks):
    logging.info("TrackingReprocessed: clip %s tracks %s", clip_id, tracks)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    try:
        import dbus
        import dbus.mainloop.glib
        from gi.repository import GLib
    except ImportError:
        print(
            "dbus-python + PyGObject are required for the live listener "
            "(host-side Pi dependencies; see services/service.py for the "
            "in-process signal log used elsewhere)",
            file=sys.stderr,
        )
        return 1

    dbus.mainloop.glib.DBusGMainLoop(set_as_default=True)
    bus = dbus.SystemBus()
    obj = bus.get_object(DBUS_NAME, DBUS_PATH)
    try:
        labels = obj.ClassificationLabels(dbus_interface=DBUS_NAME)
        model_labels.extend(str(l) for l in labels)
        logging.info("Classification labels: %s", model_labels)
    except Exception:
        logging.warning("could not fetch classification labels")
    bus.add_signal_receiver(tracking, dbus_interface=DBUS_NAME,
                            signal_name="Tracking")
    bus.add_signal_receiver(track_filtered, dbus_interface=DBUS_NAME,
                            signal_name="TrackFiltered")
    bus.add_signal_receiver(recording, dbus_interface=DBUS_NAME,
                            signal_name="Recording")
    bus.add_signal_receiver(reprocessed, dbus_interface=DBUS_NAME,
                            signal_name="TrackingReprocessed")
    GLib.MainLoop().run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
