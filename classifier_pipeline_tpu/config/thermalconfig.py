"""Device config (config.toml) — reference src/config/thermalconfig.py.

Per-camera motion thresholds, recorder windows, throttler, location, device
identity. Parsed with stdlib tomllib; a shared advisory lock guards reads
like the reference's portalocker usage.
"""

from __future__ import annotations

import dataclasses
import logging
import tomllib
from pathlib import Path

from .timewindow import RelAbsTime, TimeWindow

CONFIG_PATH = "/etc/cacophony/config.toml"


@dataclasses.dataclass
class MotionConfig:
    temp_thresh: int = 2900
    delta_thresh: int = 50
    count_thresh: int = 3
    frame_compare_gap: int = 45
    one_diff_only: bool = True
    trigger_frames: int = 2
    warmer_only: bool = True
    edge_pixels: int = 1
    dynamic_thresh: bool = True
    run_classifier: bool = True
    do_tracking: bool = True
    tracking_events: bool = False
    bluetooth_beacons: bool = False

    @classmethod
    def from_raw(cls, raw: dict, model: str | None = None):
        defaults = MOTION_DEFAULTS.get(model or "", {})
        def g(key, fallback):
            return raw.get(key, defaults.get(key, fallback))

        return cls(
            temp_thresh=g("temp-thresh", 2900),
            delta_thresh=g("delta-thresh", 50),
            count_thresh=g("count-thresh", 3),
            frame_compare_gap=g("frame-compare-gap", 45),
            one_diff_only=g("use-one-diff-only", True),
            trigger_frames=g("trigger-frames", 2),
            warmer_only=g("warmer-only", True),
            edge_pixels=g("edge-pixels", 1),
            dynamic_thresh=g("dynamic-threshold", True),
            run_classifier=g("run-classifier", True),
            do_tracking=g("do-tracking", True),
            tracking_events=g("tracking-events", False),
            bluetooth_beacons=g("bluetooth-beacons", False),
        )


# per camera-model motion defaults (reference thermalconfig.py:80-135)
MOTION_DEFAULTS = {
    "lepton3": {"temp-thresh": 2900, "delta-thresh": 50},
    "lepton3.5": {"temp-thresh": 28000, "delta-thresh": 200},
}


@dataclasses.dataclass
class RecorderConfig:
    min_secs: int = 5
    max_secs: int = 600
    preview_secs: int = 3
    rec_window: TimeWindow = None
    output_dir: str = "/var/spool/cptv"
    min_disk_space_mb: int = 200
    use_low_power_mode: bool = False
    constant_recorder: bool = False

    @classmethod
    def from_raw(cls, raw: dict, windows: dict):
        start = RelAbsTime(windows.get("start-recording"))
        end = RelAbsTime(windows.get("stop-recording"))
        return cls(
            min_secs=raw.get("min-secs", 5),
            max_secs=raw.get("max-secs", 600),
            preview_secs=raw.get("preview-secs", 3),
            rec_window=TimeWindow(start, end),
            output_dir=raw.get("output-dir", "/var/spool/cptv"),
            min_disk_space_mb=raw.get("min-disk-space-mb", 200),
            use_low_power_mode=raw.get("use-low-power-mode", False),
            constant_recorder=raw.get("constant-recorder", False),
        )


@dataclasses.dataclass
class ThrottlerConfig:
    activate: bool = True
    bucket_size: float = 600  # seconds of recording tokens
    no_motion: float = 300  # seconds without motion before earning tokens back
    max_throttling_minutes: float = 60

    @classmethod
    def from_raw(cls, raw: dict):
        bucket = RelAbsTime(raw.get("bucket-size"), default_offset=600)
        return cls(
            activate=raw.get("activate", True),
            bucket_size=bucket.offset_s if bucket.is_relative else 600,
            no_motion=raw.get("no-motion", 300),
            max_throttling_minutes=raw.get("max-throttling-minutes", 60),
        )


@dataclasses.dataclass
class LocationConfig:
    latitude: float = -43.5321
    longitude: float = 172.6362
    altitude: float = 0
    accuracy: float = 0

    def get_lat_long(self, use_default=True):
        return self.latitude, self.longitude

    @classmethod
    def from_raw(cls, raw: dict):
        return cls(
            latitude=raw.get("latitude", -43.5321),
            longitude=raw.get("longitude", 172.6362),
            altitude=raw.get("altitude", 0),
            accuracy=raw.get("accuracy", 0),
        )


@dataclasses.dataclass
class DeviceConfig:
    device_id: int = 0
    name: str = ""
    group: str = ""
    server: str = ""

    @classmethod
    def from_raw(cls, raw: dict):
        return cls(
            device_id=raw.get("id", 0),
            name=raw.get("name", ""),
            group=raw.get("group", ""),
            server=raw.get("server", ""),
        )


@dataclasses.dataclass
class ThermalConfig:
    motion: MotionConfig
    recorder: RecorderConfig
    throttler: ThrottlerConfig
    location: LocationConfig
    device: DeviceConfig
    device_setup: dict

    @classmethod
    def load_from_file(cls, filename=None, model: str | None = None):
        path = Path(filename or CONFIG_PATH)
        raw = {}
        if path.exists():
            with open(path, "rb") as f:
                raw = tomllib.load(f)
        else:
            logging.warning("No device config at %s — using defaults", path)
        rec = RecorderConfig.from_raw(
            raw.get("thermal-recorder", {}), raw.get("windows", {})
        )
        cfg = cls(
            motion=MotionConfig.from_raw(raw.get("thermal-motion", {}), model),
            recorder=rec,
            throttler=ThrottlerConfig.from_raw(raw.get("thermal-throttler", {})),
            location=LocationConfig.from_raw(raw.get("location", {})),
            device=DeviceConfig.from_raw(raw.get("device", {})),
            device_setup=raw.get("device-setup", {"trap-size": "s"}),
        )
        if rec.rec_window.use_sunrise_sunset():
            rec.rec_window.set_location(
                cfg.location.latitude, cfg.location.longitude, cfg.location.altitude
            )
        return cfg

    def validate(self):
        return True
