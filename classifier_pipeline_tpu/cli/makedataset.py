"""CPTV corpus -> HDF5 track database (reference src/mldataset/makedataset.py
ClipLoader)."""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np


def process_clip(db, path, tag_precedence=None):
    from classifier_pipeline_tpu.data.rawdb import RawDatabase

    raw = RawDatabase(path)
    if raw.meta_data is None:
        logging.warning("skipping %s (no metadata)", path)
        return False
    raw.load_frames()
    header = raw.get_clip_tracks(tag_precedence)
    thermal, filtered = raw.frames
    db.create_clip(
        header.clip_id,
        metadata={
            "source": str(path),
            "station_id": header.station_id or 0,
            "device": header.camera or 0,
            "ffc_frames": header.ffc_frames or [],
            "model": raw.model or "",
        },
        background=raw.background,
    )
    for track in header.tracks:
        frames = []
        regions = []
        for r in track.bounds_history:
            fn = r.frame_number
            if fn >= len(thermal) or r.width <= 0 or r.height <= 0:
                continue
            th = thermal[fn, r.y : r.bottom, r.x : r.right]
            fi = filtered[fn, r.y : r.bottom, r.x : r.right]
            frames.append(np.stack([th.astype(np.float32), fi]))
            regions.append(r)
        db.add_track(
            header.clip_id, track.track_id, frames, regions,
            tags=[{"what": track.label, "confidence": track.confidence}]
            if track.label
            else [],
            start_frame=track.start_frame,
        )
    return True


def main(argv=None):
    parser = argparse.ArgumentParser(description="CPTV corpus -> HDF5 database")
    parser.add_argument("data_dir")
    parser.add_argument("-o", "--out-file", default="dataset.hdf5")
    args = parser.parse_args(argv)
    from classifier_pipeline_tpu.data.trackdb import TrackDatabase
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    db = TrackDatabase(args.out_file)
    files = sorted(Path(args.data_dir).rglob("*.cptv"))
    done = 0
    for f in files:
        try:
            if process_clip(db, f):
                done += 1
        except Exception:
            logging.error("failed on %s", f, exc_info=True)
    logging.info("stored %d/%d clips in %s", done, len(files), args.out_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
