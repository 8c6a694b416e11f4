"""Pipeline configuration (classifier.yaml equivalent).

Mirrors the reference's two-level config (reference src/config/config.py:46-78:
attrs classes with defaults deep-merged under the raw yaml). We keep plain
dicts + dataclasses: the yaml schema is compatible, unknown keys are ignored,
defaults match the reference's thermal defaults.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import yaml

CONFIG_SEARCH = [Path("/etc/cacophony/classifier.yaml"), Path("classifier.yaml")]


def deep_merge_defaults(defaults: dict, raw: dict) -> dict:
    """Keys missing from raw are filled from defaults (recursively) —
    reference deep_copy_map_if_key_not_exist (defaultconfig.py:36)."""
    out = dict(raw or {})
    for k, v in defaults.items():
        if k not in out or out[k] is None:
            out[k] = v
        elif isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = deep_merge_defaults(v, out[k])
    return out


THERMAL_TRACKING_DEFAULTS = {
    "tracker": "RegionTracker",
    "edge_pixels": 1,
    "frame_padding": 4,
    "min_dimension": 0,
    "track_smoothing": False,
    "denoise": True,
    "high_quality_optical_flow": False,
    "max_tracks": None,
    "min_tag_confidence": 0.8,
    "min_moving_frames": 2,
    "max_blank_percent": 30,
    "max_jitter": 20,
    "filter_regions_pre_match": True,
    "min_hist_diff": None,
    "filters": {
        "track_overlap_ratio": 0.5,
        "min_duration_secs": 0,
        "track_min_offset": 4.0,
        "track_min_mass": 2.0,
        "moving_vel_thresh": 4,
    },
    "areas_of_interest": {
        "min_mass": 4.0,
        "pixel_variance": 2.0,
        "cropped_regions_strategy": "cautious",
    },
    "params": {
        "base_distance_change": 450,
        "min_mass_change": 20,
        "restrict_mass_after": 1.5,
        "mass_change_percent": 0.55,
        "max_distance": 2000,
        "max_blanks": 18,
        "velocity_multiplier": 2,
        "base_velocity": 2,
    },
}

IR_TRACKING_DEFAULTS = deep_merge_defaults(
    THERMAL_TRACKING_DEFAULTS,
    {
        "min_dimension": 10,
        "frame_padding": 10,
        "edge_pixels": 0,
        "filter_regions_pre_match": False,
        "filters": {"min_duration_secs": 0, "track_min_offset": 20},
        "areas_of_interest": {"pixel_variance": 0, "min_mass": 0},
        "params": {
            "base_distance_change": 12000,
            "min_mass_change": None,
            "mass_change_percent": None,
            "max_distance": 30752,
            "velocity_multiplier": 8,
            "base_velocity": 10,
        },
    },
)

DEFAULTS = {
    "base_data_folder": ".",
    "source_folder": "clips",
    "tracks_folder": "tracks",
    "worker_threads": 0,
    "verbose": False,
    "use_opt_flow": False,
    "tracking": {
        "thermal": THERMAL_TRACKING_DEFAULTS,
        "IR": IR_TRACKING_DEFAULTS,
    },
    "classify": {
        "models": [],
        "cache_to_disk": False,
        "preview": "none",
    },
    "train": {},
    "build": {},
}


@dataclasses.dataclass
class ModelConfig:
    """reference src/config/classifyconfig.py ModelConfig."""

    id: int
    name: str = ""
    model_file: str = ""
    type: str = "Flax"
    model_weights: str | None = None
    wallaby: bool = False
    tag_scores: dict = dataclasses.field(default_factory=lambda: {"default": 0})
    ignored_tags: list = dataclasses.field(default_factory=list)
    thumbnail_model: bool = False
    run_over_network: bool = False
    port: int = 8123
    preprocess_fn: str | None = None

    @classmethod
    def from_raw(cls, raw: dict) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})


class Config:
    """Loaded pipeline config. Access raw dict via [] or attributes for the
    common fields."""

    def __init__(self, raw: dict, path: Path | None = None):
        self.raw = deep_merge_defaults(DEFAULTS, raw)
        self.path = path

    def __getitem__(self, k):
        return self.raw[k]

    def get(self, k, default=None):
        return self.raw.get(k, default)

    @property
    def tracking(self):
        return self.raw["tracking"]

    @property
    def base_data_folder(self):
        return Path(self.raw["base_data_folder"])

    @property
    def source_folder(self):
        return self.base_data_folder / self.raw["source_folder"]

    @property
    def tracks_folder(self):
        return self.base_data_folder / self.raw["tracks_folder"]

    @property
    def models(self) -> list[ModelConfig]:
        return [
            ModelConfig.from_raw(m)
            for m in (self.raw.get("classify", {}).get("models") or [])
        ]

    @property
    def worker_threads(self):
        return int(self.raw.get("worker_threads") or 0)

    @classmethod
    def load_from_file(cls, filename=None) -> "Config":
        path = Path(filename) if filename else cls.find_config()
        raw = {}
        if path and Path(path).exists():
            with open(path) as f:
                raw = yaml.safe_load(f) or {}
        return cls(raw, path)

    @staticmethod
    def find_config():
        env = os.environ.get("CLASSIFIER_CONFIG")
        if env:
            return Path(env)
        for p in CONFIG_SEARCH:
            if p.exists():
                return p
        return None
