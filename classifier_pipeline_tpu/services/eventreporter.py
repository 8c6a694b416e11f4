"""Device event reporting (reference src/piclassifier/eventreporter.py).

The reference posts events over dbus to the Cacophony event API. dbus is
host-specific; when the dbus bindings are absent we log and keep an in-memory
tail so tests and headless deployments can observe events.
"""

from __future__ import annotations

import logging
import time
from collections import deque

RECENT_EVENTS = deque(maxlen=256)

try:  # pragma: no cover - device-only dependency
    import dbus  # noqa: F401

    _HAVE_DBUS = True
except ImportError:
    _HAVE_DBUS = False


def log_event(event_type, details=None):
    RECENT_EVENTS.append((time.time(), event_type, details))
    if _HAVE_DBUS:
        try:
            import dbus

            bus = dbus.SystemBus()
            proxy = bus.get_object(
                "org.cacophony.Events", "/org/cacophony/Events"
            )
            proxy.Add(str(details or ""), str(event_type), int(time.time() * 1e9))
            return
        except Exception:
            logging.exception("dbus event failed")
    logging.info("event: %s %s", event_type, details or "")


def throttled_event():
    log_event("throttle")
