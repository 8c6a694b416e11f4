"""Raw CPTV-backed database (reference src/ml_tools/rawdb.py).

Re-derives frames, the weighted background, FFC list, and track headers from
a .cptv file plus its .txt metadata sidecar. The background replay uses the
same WeightedBackground + trailing-45-mean math as the tracker, vectorized
in NumPy (the result feeds dataset generation, not the device hot path).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.cptv import load_cptv
from classifier_pipeline_tpu.track.postprocess import RegionRow

from .datasetstructures import ClipHeader, TrackHeader

FPS = 9
RES_X, RES_Y = 160, 120

# lat/lng rectangles per country (reference config/buildconfig.py
# COUNTRY_LOCATIONS: AU and NZ bounding boxes)
COUNTRY_LOCATIONS = {
    "AU": (112.0, -44.0, 154.0, -10.0),  # lng_min, lat_min, lng_max, lat_max
    "NZ": (166.0, -48.0, 179.0, -34.0),
}


def region_from_json(r: dict) -> RegionRow:
    frame = r.get("frame_number")
    if frame is None:
        frame = r.get("frameNumber")
    if frame is None:
        frame = r.get("order")
    mass = r.get("mass", 0) or 0
    centroid = r.get(
        "centroid", [r["x"] + r["width"] / 2, r["y"] + r["height"] / 2]
    )
    return RegionRow(
        x=r["x"], y=r["y"], width=r["width"], height=r["height"], mass=mass,
        frame_number=frame if frame is not None else 0,
        pixel_variance=r.get("pixel_variance", 0) or 0,
        blank=r.get("blank", False),
        centroid=(centroid[0], centroid[1]),
        is_along_border=False,
        in_trap=r.get("in_trap", False),
    )


class RawDatabase:
    def __init__(self, database_filename):
        self.file = Path(database_filename)
        self.meta_data_file = self.file.with_suffix(".txt")
        self._meta_data = None
        self.background = None
        self.ffc_frames = None
        self.frames = None  # (thermal (T,H,W) u16, filtered (T,H,W) f32)
        self.model = None
        self.crop_rectangle = (1, 1, RES_X - 2, RES_Y - 2)

    @property
    def meta_data(self):
        if self._meta_data is None:
            if not self.meta_data_file.is_file():
                logging.warning("No metadata for %s", self.meta_data_file)
                return None
            self._meta_data = json.loads(self.meta_data_file.read_text())
        return self._meta_data

    def load_frames(self):
        """Decode + replay the background model (reference rawdb.py:68-126)."""
        clip = load_cptv(self.file)
        tracker_version = (self.meta_data or {}).get("tracker_version", 11)
        pixels = clip.pixels
        is_bg = clip.is_background
        t_on = clip.time_on_ms.astype(np.int64)
        t_ffc = clip.last_ffc_ms.astype(np.int64)

        first = pixels[0]
        average = float(np.mean(first))
        if average > 10000:
            self.model = "lepton3.5"
            weight_add = 1.0
        else:
            self.model = "lepton3"
            weight_add = 0.1

        cx, cy, cw, ch = self.crop_rectangle
        bg = np.float64(np.int32(first))
        # edge replicate
        bg[:cy] = bg[cy]
        bg[cy + ch :] = bg[cy + ch - 1]
        bg[:, :cx] = bg[:, cx : cx + 1]
        bg[:, cx + cw :] = bg[:, cx + cw - 1 : cx + cw]
        weight = np.zeros((ch, cw))

        thermals = []
        filtereds = []
        ffc_frames = []
        frame_i = 0
        ring = []
        for i in range(clip.n_frames):
            if is_bg[i] and tracker_version >= 10:
                continue
            pix = pixels[i]
            if (t_on[i] - t_ffc[i]) < 9:  # int-ms FFC quirk
                ffc_frames.append(frame_i)
            thermals.append(pix)
            filtereds.append(np.float32(pix) - np.float32(bg))
            ring.append(pix)
            if len(ring) > 45:
                ring.pop(0)
            # WeightedBackground update with trailing mean
            frame = np.int32(np.mean(ring, axis=0))[cy : cy + ch, cx : cx + cw]
            interior = bg[cy : cy + ch, cx : cx + cw]
            descend = interior < frame - weight
            new_interior = np.where(descend, interior, frame)
            weight = np.where(descend, weight + weight_add, 0)
            if np.any(new_interior != interior):
                bg[cy : cy + ch, cx : cx + cw] = new_interior
                bg[:cy] = bg[cy]
                bg[cy + ch :] = bg[cy + ch - 1]
                bg[:, :cx] = bg[:, cx : cx + 1]
                bg[:, cx + cw :] = bg[:, cx + cw - 1 : cx + cw]
            frame_i += 1
        self.frames = (np.stack(thermals), np.stack(filtereds))
        self.ffc_frames = ffc_frames
        self.background = bg

    def get_clip_tracks(self, tag_precedence=None):
        metadata = self.meta_data
        if metadata is None:
            return None
        location = metadata.get("location")
        country_code = None
        lat = lng = None
        if location is not None:
            try:
                lat, lng = location.get("lat"), location.get("lng")
                if lat is not None and lng is not None:
                    for country, (x0, y0, x1, y1) in COUNTRY_LOCATIONS.items():
                        if x0 <= lng <= x1 and y0 <= lat <= y1:
                            country_code = country
                            break
            except (TypeError, AttributeError):
                pass
        rec_time = None
        if metadata.get("recordingDateTime"):
            from datetime import datetime

            try:
                rec_time = datetime.fromisoformat(
                    metadata["recordingDateTime"].replace("Z", "+00:00")
                )
            except ValueError:
                pass
        clip_header = ClipHeader(
            clip_id=int(metadata.get("id", 0)),
            station_id=metadata.get("stationId"),
            source_file=self.file,
            location=None if lat is None or lng is None else (lng, lat),
            camera=metadata.get("deviceId"),
            rec_time=rec_time,
            frames_per_second=10 if self.file.suffix == ".mp4" else FPS,
            tracks=[],
            ffc_frames=self.ffc_frames,
            country_code=country_code,
        )
        tracks_meta = metadata.get("Tracks") or metadata.get("tracks") or []
        for track_meta in tracks_meta:
            try:
                tags = track_meta.get("tags", [])
                tag = best_human_tag(tags, tag_precedence, 0)
                human_tag = tag["what"] if tag else None
                human_tag_confidence = tag["confidence"] if tag else None
                human_tags = [
                    (t.get("what"), t.get("confidence"))
                    for t in tags
                    if not t.get("automatic", False)
                ]
                regions = {}
                start = end = None
                prev_frame = None
                for i, r in enumerate(track_meta.get("positions", [])):
                    region = region_from_json(r)
                    if region.frame_number is None:
                        region.frame_number = (prev_frame or 0) + 1
                    prev_frame = region.frame_number
                    regions[region.frame_number] = region
                    if start is None:
                        start = region.frame_number
                    end = region.frame_number
                if start is None:
                    continue
                clip_header.tracks.append(
                    TrackHeader(
                        clip_id=clip_header.clip_id,
                        track_id=int(track_meta["id"]),
                        label=human_tag,
                        num_frames=len(regions),
                        regions=regions,
                        start_frame=start,
                        confidence=human_tag_confidence,
                        human_tags=human_tags,
                        source_file=self.file,
                        station_id=clip_header.station_id,
                        ffc_frames=self.ffc_frames,
                    )
                )
            except Exception:
                logging.error(
                    "Could not load track %s", track_meta.get("id"), exc_info=True
                )
        return clip_header

    def get_clip_meta(self, tag_precedence=None):
        return self.get_clip_tracks(tag_precedence)


def best_human_tag(track_tags, tag_precedence=None, min_confidence=-1):
    """reference Track.get_best_human_tag (track.py:1033-1081)."""
    if track_tags is None:
        return None
    track_tags = [
        t for t in track_tags
        if not t.get("automatic", False) and t.get("confidence", 0) >= min_confidence
    ]
    if not track_tags:
        return None
    if tag_precedence is None:
        default_prec = 100
        tag_precedence = {}
    else:
        default_prec = tag_precedence.get("default", 100)
    tag = None
    best = None
    for tt in track_tags:
        what = tt.get("what")
        ranking = tag_precedence.get(what, default_prec) + 1 - tt.get("confidence", 0)
        if tag is not None and ranking == best:
            path_one = tag.get("path", "")
            path_two = tt.get("path", "")
            same_parents = path_one in path_two or path_two in path_one
            if tag["what"] != tt["what"] and not same_parents:
                tag = None
            elif len(path_two) > len(path_one):
                tag = tt
        elif best is None or ranking < best:
            best = ranking
            tag = tt
    return tag
