"""addpredictions CLI (reference src/addpredictions.py): bulk-add model
predictions for every track in an HDF5 database or a directory of clips."""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np


def evaluate_db(db_path, model_file, platform=None):
    from classifier_pipeline_tpu.classify.interpreter import (
        ClipContext,
        FlaxInterpreter,
    )
    from classifier_pipeline_tpu.data.rawdb import RawDatabase
    from classifier_pipeline_tpu.data.trackdb import TrackDatabase
    from classifier_pipeline_tpu.track.postprocess import RegionRow

    interp = FlaxInterpreter(model_file)
    db = TrackDatabase(db_path)
    n = 0
    for clip_id in db.get_clip_ids():
        meta = db.get_clip_meta(clip_id)
        source = meta.get("source")
        if not source or not Path(source).exists():
            logging.warning("clip %s has no source file, skipping", clip_id)
            continue
        raw = RawDatabase(source)
        raw.load_frames()
        thermal, filtered = raw.frames
        ctx = ClipContext(thermal, filtered, raw.ffc_frames)
        ctx.background = raw.background
        header = raw.get_clip_tracks()
        if header is None:
            continue
        for track in header.tracks:
            bounds = track.bounds_history

            class T:
                track_id = track.track_id
                start_frame = track.start_frame

            T.bounds = bounds
            tp = interp.classify_track(ctx, T, min_segments=1)
            if tp is None:
                continue
            db.add_predictions(
                clip_id, track.track_id,
                {
                    "model": str(model_file),
                    "label": tp.predicted_tag(),
                    "confidence": float(tp.max_score or 0),
                    "all_class_confidences": tp.class_confidences(),
                },
            )
            n += 1
    logging.info("added predictions for %d tracks", n)
    return n


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("db", help="HDF5 track database")
    parser.add_argument("-m", "--model-file", required=True)
    parser.add_argument("--platform", choices=["tpu", "cpu", "default"], default="default")
    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    evaluate_db(args.db, args.model_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
