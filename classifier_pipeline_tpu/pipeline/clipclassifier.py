"""Clip classification pipeline (reference src/classify/clipclassifier.py).

process_file: track extraction (or metadata reuse) -> per-model, per-track
segment classification -> merged metadata JSON. The classifier cascade's
heavy work (crop/resize/normalize/tile + CNN forward over every segment of
every track) is batched device code; this module orchestrates.
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.classify.interpreter import ClipContext, get_interpreter
from classifier_pipeline_tpu.classify.trackprediction import Predictions
from classifier_pipeline_tpu.config.config import Config, ModelConfig
from classifier_pipeline_tpu.pipeline.extractor import (
    ClipTrackExtractor,
    _json_default,
)


class ClipClassifier:
    def __init__(self, config: Config, model=None, seed=None):
        self.config = config
        self.models = [model] if model else config.models
        if not self.models:
            raise ValueError("no classification models configured")
        self.seed = seed
        self._interpreters = {}

    def get_classifier(self, model: ModelConfig):
        key = model.id
        if key not in self._interpreters:
            t0 = time.time()
            self._interpreters[key] = get_interpreter(model, seed=self.seed)
            logging.info(
                "Loaded model %s in %.1fs", model.name or model.model_file,
                time.time() - t0,
            )
        return self._interpreters[key]

    def process_file(self, filename, cache=None, reuse_frames=None) -> dict:
        start = time.time()
        filename = Path(filename)
        extractor = ClipTrackExtractor(
            config=self.config.raw, keep_rows=True, emit_filtered=True
        )
        result = extractor.extract(filename)

        thermal = result.clip.foreground_pixels
        # rows.filtered stays on device; ClipContext consumes it there
        ctx = ClipContext(thermal, result.rows.filtered, self._ffc_frames(result))

        predictions_per_model = {}
        for model in self.models:
            interpreter = self.get_classifier(model)
            preds = Predictions(interpreter.labels, model, interpreter.thresholds)
            predictions_per_model[model.id] = preds
            for track in result.tracks:
                # min_segments=1: always classify even very short tracks
                # (reference clipclassifier.py:282-284)
                tp = interpreter.classify_track(ctx, track, min_segments=1)
                if tp is not None:
                    preds.prediction_per_track[track.track_id] = tp
                    logging.info(
                        "%s - track %s: %s (%.2f)",
                        filename.name,
                        track.track_id,
                        tp.predicted_tag(),
                        tp.max_score or 0,
                    )

        meta = result.metadata
        for i, track in enumerate(result.tracks):
            pred_info = []
            for model_id, preds in predictions_per_model.items():
                tp = preds.prediction_for(track.track_id)
                if tp is None:
                    continue
                pm = tp.get_metadata(preds.thresholds)
                pm["model_id"] = model_id
                pred_info.append(pm)
            meta["tracks"][i]["predictions"] = pred_info
        meta["models"] = [vars(m) for m in self.models]
        logging.info(
            "Classified %s (%d tracks) in %.1fs",
            filename.name, len(result.tracks), time.time() - start,
        )
        return meta

    def process_file_from_metadata(self, filename) -> dict:
        """Classify reusing tracks from the existing .txt sidecar instead of
        re-tracking (reference classify with track=False:
        clipclassifier.py:203-208 Clip.load_metadata + parse_clip)."""
        from classifier_pipeline_tpu.data.rawdb import RawDatabase
        from classifier_pipeline_tpu.track.postprocess import AssembledTrack

        filename = Path(filename)
        raw = RawDatabase(filename)
        meta = raw.meta_data
        if meta is None:
            raise FileNotFoundError(f"no metadata sidecar for {filename}")
        raw.load_frames()
        thermal, filtered = raw.frames
        ctx = ClipContext(thermal, filtered, raw.ffc_frames)
        ctx.background = raw.background
        header = raw.get_clip_tracks()
        tracks = []
        for th in header.tracks:
            bounds = th.bounds_history
            tracks.append(
                AssembledTrack(
                    track_id=th.track_id,
                    start_frame=th.start_frame,
                    bounds=bounds,
                    vel_x=[0] * len(bounds),
                    vel_y=[0] * len(bounds),
                    blank_frames=sum(1 for b in bounds if b.blank),
                    fsts=0,
                )
            )
        predictions_per_model = {}
        for model in self.models:
            interpreter = self.get_classifier(model)
            preds = Predictions(interpreter.labels, model, interpreter.thresholds)
            predictions_per_model[model.id] = preds
            for track in tracks:
                tp = interpreter.classify_track(ctx, track, min_segments=1)
                if tp is not None:
                    preds.prediction_per_track[track.track_id] = tp
        for t_meta in meta.get("tracks", []):
            pred_info = []
            for model_id, preds in predictions_per_model.items():
                tp = preds.prediction_for(t_meta["id"])
                if tp is None:
                    continue
                pm = tp.get_metadata(preds.thresholds)
                pm["model_id"] = model_id
                pred_info.append(pm)
            t_meta["predictions"] = pred_info
        meta["models"] = [vars(m) for m in self.models]
        return meta

    def process_batch(self, paths, chunks: int | None = None) -> list[dict]:
        """Batch path: track all clips concurrently, then classify every
        track of every clip in one device call per model.

        The batch is split into ``chunks`` software-pipeline stages: every
        chunk's upload + scan is dispatched up front (JAX async dispatch), so
        chunk k's host work — row fetch, track assembly, thumbnails,
        metadata — overlaps chunk k+1's device compute, and all uploads ride
        the tunnel while the first scan runs.
        """
        from classifier_pipeline_tpu.classify.interpreter import (
            classify_clip_batch_collect,
            classify_clip_batch_dispatch,
        )

        if chunks is None:
            # 4 chunks measured best once the upload assembles from decoder
            # deltas (sweep 2/4: ~8.4s vs ~7.4s per 64 clips): finer chunks
            # hide more of the first chunk's decode behind device compute,
            # and dispatch is now cheap enough that the smaller (B=16) scans
            # don't cost more than the overlap buys
            chunks = int(os.environ.get("BATCH_PIPELINE_CHUNKS", "4"))
        chunks = max(1, min(chunks, len(paths)))
        start = time.time()
        extractor = ClipTrackExtractor(
            config=self.config.raw, keep_rows=True, emit_filtered=True
        )
        # split into near-equal chunks, preserving order
        bounds = np.linspace(0, len(paths), chunks + 1).astype(int)
        groups = [paths[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
        # decode+dispatch runs on ONE pipeline worker so later chunks'
        # decode (C inflate, GIL released) fills the main thread's blocking
        # tunnel waits (scan/classify fetches, ~2s/batch measured). An
        # earlier design dispatched everything up front on the main thread;
        # the re-measure with prefetch + delta uploads shows waits dominate
        # the tail, and staging reuse is serialized by the dispatch lock.
        pipe = None
        if os.environ.get("BATCH_DECODE_THREAD", "1") != "0" and len(groups) > 1:
            from concurrent.futures import ThreadPoolExecutor

            pipe = ThreadPoolExecutor(max_workers=1)
            futures = [pipe.submit(extractor.scan_batch, g) for g in groups]
            handle_seq = (f.result() for f in futures)
        else:
            handle_seq = iter([extractor.scan_batch(g) for g in groups])

        # Phase B: per chunk — block on its (prefetched) scan, assemble
        # tracks on host, DISPATCH its classify; the classify outputs start
        # background fetches immediately, so phase C's collection never
        # leaves the device idle. (Before worker-thread prefetch existed,
        # deferring the prediction fetches measured slower — with prefetch,
        # deferral wins: chunk k's classify compute overlaps chunk k+1's
        # assembly AND its own result transfer.) Only metadata/track ids are
        # retained per chunk — holding whole ExtractResults would keep every
        # chunk's pixel blocks and device groups alive until return.
        chunk_results = []
        for handle in handle_seq:
            results = extractor.collect_batch(handle)
            ctxs = []
            for res in results:
                thermal = res.clip.foreground_pixels
                # reuse the scan's device-resident group arrays + medians
                ctx = ClipContext(
                    thermal, res.rows.filtered, self._ffc_frames(res),
                    medians=res.frame_medians,
                    device_group=res.device_group, lane=res.lane,
                )
                ctx.thermal_dev16 = res.thermal_dev16
                ctxs.append(ctx)
            pred_handles = {}
            for model in self.models:
                interpreter = self.get_classifier(model)
                with extractor._stage("classify-dispatch"):
                    pred_handles[model.id] = (
                        interpreter,
                        classify_clip_batch_dispatch(
                            interpreter, ctxs, [res.tracks for res in results],
                            min_segments=1,
                        ),
                    )
            chunk_results.append(
                (
                    [res.metadata for res in results],
                    [[t.track_id for t in res.tracks] for res in results],
                    pred_handles,
                )
            )
            del results, ctxs  # release pixels/rows/groups with the chunk

        # Phase C: collect predictions and merge metadata per chunk
        if pipe is not None:
            pipe.shutdown(wait=False)  # all futures already consumed
        metas = []
        for chunk_metas, chunk_track_ids, pred_handles in chunk_results:
            with extractor._stage("classify-wait"):
                all_preds = {
                    mid: (interp, classify_clip_batch_collect(h))
                    for mid, (interp, h) in pred_handles.items()
                }
            for ci, meta in enumerate(chunk_metas):
                for i, track_id in enumerate(chunk_track_ids[ci]):
                    pred_info = []
                    for model_id, (interpreter, per_clip) in all_preds.items():
                        tp = per_clip[ci].get(track_id)
                        if tp is None:
                            continue
                        pm = tp.get_metadata(interpreter.thresholds)
                        pm["model_id"] = model_id
                        pred_info.append(pm)
                    meta["tracks"][i]["predictions"] = pred_info
                meta["models"] = [vars(m) for m in self.models]
                metas.append(meta)
        logging.info(
            "Classified %d clips in %.1fs", len(paths), time.time() - start
        )
        if extractor.timer is not None:
            extractor.timer.log("process_batch ")
        return metas

    @staticmethod
    def _ffc_frames(result):
        clip = result.clip
        mask = ~clip.is_background
        t = clip.time_on_ms[mask].astype(np.int64)
        c = clip.last_ffc_ms[mask].astype(np.int64)
        return list(np.nonzero((t - c) < 9)[0])

    def save_metadata(self, meta, out_path):
        with open(out_path, "w") as f:
            json.dump(meta, f, indent=4, default=_json_default)
        return out_path
