"""extract CLI — track extraction over CPTV files/directories.

Reference entry point parity: src/extract.py (argv -> TrackExtractor.extract).
"""

from __future__ import annotations

import argparse
import json
import logging
import multiprocessing
import sys
import time
from pathlib import Path

from classifier_pipeline_tpu.config.config import Config
from classifier_pipeline_tpu.pipeline.extractor import (
    ClipTrackExtractor,
    save_metadata,
)
from classifier_pipeline_tpu.utils.logs import init_logging
from classifier_pipeline_tpu.utils.tools import enable_compile_cache


IR_SUFFIXES = (".mp4", ".avi")


def _merge_sidecar(path, meta, retrack):
    """reference behavior (trackextractor.py:164-166, get_metadata:237-246):
    whenever a .txt sidecar exists its metadata is merged into the output
    (old tracks dropped, new metadata wins key conflicts). --retrack
    additionally seeds the clip id from the sidecar (clip.load_metadata,
    trackextractor.py:168-171)."""
    sidecar = Path(path).with_suffix(".txt")
    if not sidecar.exists():
        return meta
    try:
        existing = json.loads(sidecar.read_text())
    except (json.JSONDecodeError, OSError):
        return meta
    if not isinstance(existing, dict):
        return meta
    existing.pop("tracks", None)
    existing.pop("Tracks", None)
    new_meta = dict(meta)
    if retrack and "id" in existing:
        new_meta.pop("id", None)
    existing.update(new_meta)
    return existing


def process_one(args):
    path, config_raw, out_dir, to_stdout, preview, retrack = args
    if Path(path).suffix.lower() in IR_SUFFIXES:
        # reference picks the extractor by extension
        # (trackextractor.py:137-158): video files go through the IR tracker
        return _process_ir(path, config_raw, out_dir, to_stdout, preview,
                           retrack)
    # the 4-up tracking debug view needs the filtered channel + masks
    debug_preview = preview == "tracking"
    ex = ClipTrackExtractor(
        config=config_raw, keep_rows=debug_preview,
        emit_filtered=debug_preview, emit_mask=debug_preview,
    )
    res = ex.extract(path)
    res.metadata = _merge_sidecar(path, res.metadata, retrack)
    if to_stdout:
        print(json.dumps(res.metadata, default=str))
    else:
        out = None
        if out_dir:
            out = Path(out_dir) / (Path(path).stem + ".txt")
            out.parent.mkdir(parents=True, exist_ok=True)
        save_metadata(res, out)
    if preview and preview != "none":
        from classifier_pipeline_tpu.io.previewer import Previewer

        mp4 = (out or Path(path)).with_suffix("")
        mp4 = mp4.parent / f"{mp4.name}-tracking.mp4"
        thermal = res.clip.foreground_pixels
        extra = {}
        if debug_preview and res.rows is not None:
            import numpy as _np

            from classifier_pipeline_tpu.track import tracker_jax

            extra["filtered"] = res.filtered_np()
            extra["masks"] = tracker_jax.unpack_mask(res.rows.mask)
        Previewer(preview_type=preview).export_clip_preview(
            mp4, thermal, res.tracks, **extra
        )
    return (
        str(path),
        len(res.tracks),
        res.n_frames,
        res.tracking_time,
    )


def _process_ir(path, config_raw, out_dir, to_stdout, preview="none",
                retrack=False):
    from classifier_pipeline_tpu.pipeline.ir_extractor import IRTrackExtractor

    if preview and preview != "none":
        logging.warning("previews are not yet supported for IR video (%s)", path)
    ir_cfg = (config_raw or {}).get("tracking", {}).get("IR", {})
    ex = IRTrackExtractor(
        config=config_raw,
        scale=ir_cfg.get("scale", 0.25),
        trap_size=ir_cfg.get("trap_size", "L"),
    )
    meta, good, _filtered = ex.extract(path)
    n_frames = int(meta.get("num_frames", 0))
    meta = _merge_sidecar(path, meta, retrack)
    if to_stdout:
        print(json.dumps(meta, default=str))
    else:
        out = Path(path).with_suffix(".txt")
        if out_dir:
            out = Path(out_dir) / out.name
            out.parent.mkdir(parents=True, exist_ok=True)
        from classifier_pipeline_tpu.pipeline.extractor import _json_default

        out.write_text(json.dumps(meta, indent=4, default=_json_default))
    return (str(path), len(good), n_frames, meta.get("tracking_time", 0.0))


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native track extraction")
    parser.add_argument("target", help="a CPTV file or directory")
    parser.add_argument("-c", "--config-file", help="path to classifier.yaml")
    parser.add_argument("-o", "--out-dir", help="output directory for .txt metadata")
    parser.add_argument("--to-stdout", action="store_true", help="print JSON to stdout")
    parser.add_argument(
        "-p", "--preview", choices=["none", "raw", "boxes", "classified", "tracking"],
        default="none", help="export an MP4/GIF preview",
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument(
        "--retrack", action="store_true",
        help="re-run tracking and merge into existing .txt metadata",
    )
    parser.add_argument(
        "-w", "--workers", type=int, default=0,
        help="worker processes for directory extraction (0 = in-process)",
    )
    parser.add_argument(
        "--platform", choices=["tpu", "cpu", "default"], default="default",
        help="force the JAX platform (default: environment's accelerator)",
    )
    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    init_logging()
    enable_compile_cache()
    config = Config.load_from_file(args.config_file)

    target = Path(args.target)
    if target.is_dir():
        files = sorted(
            f
            for f in target.rglob("*")
            if f.suffix.lower() in (".cptv",) + IR_SUFFIXES
            # skip this CLI's own debug-preview outputs
            and not f.stem.endswith("-tracking")
        )
    else:
        files = [target]
    if not files:
        logging.error("no cptv/mp4/avi files under %s", target)
        return 1

    start = time.time()
    jobs = [
        (str(f), config.raw, args.out_dir, args.to_stdout, args.preview,
         args.retrack)
        for f in files
    ]
    if args.workers and len(files) > 1:
        with multiprocessing.Pool(args.workers) as pool:
            results = pool.map(process_one, jobs)
    else:
        results = [process_one(j) for j in jobs]
    total_frames = sum(r[2] for r in results)
    elapsed = time.time() - start
    logging.info(
        "extracted %d clips, %d frames in %.1fs (%.1f frames/s)",
        len(results), total_frames, elapsed, total_frames / max(elapsed, 1e-9),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
