"""Real-time streaming classifier (reference src/piclassifier/piclassifier.py).

Per-frame loop at camera rate: motion detection -> recorder control ->
streaming tracking (device step) -> two-stage classification cascade
(forest FP gate every FP_MODEL_SKIP_FRAMES, full CNN every SKIP_FRAMES on
the best non-FP track) -> tracking signals -> end-of-recording metadata.
"""

from __future__ import annotations

import json
import logging
import time
from collections import deque
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.classify.interpreter import ClipContext, get_interpreter
from classifier_pipeline_tpu.classify.trackprediction import Predictions
from classifier_pipeline_tpu.pipeline.motiondetector import CPTVMotionDetector
from classifier_pipeline_tpu.pipeline.recorders import (
    CPTVRecorder,
    DummyRecorder,
    IRRecorder,
    ThrottledRecorder,
)
from classifier_pipeline_tpu.pipeline.streamtracker import StreamingTracker
from classifier_pipeline_tpu.services.service import SnapshotService
from classifier_pipeline_tpu.track.tracker_jax import TrackingParams
from classifier_pipeline_tpu.pipeline.extractor import (
    threshold_for_model,
    _json_default,
)


class PiClassifier:
    NUM_CONCURRENT_TRACKS = 1
    DEBUG_EVERY = 20
    # try to classify a non-fp track every X frames
    SKIP_FRAMES = 25
    # only re-classify the same track after this many frames
    PREDICT_EVERY = 40
    # fp model cadence
    FP_MODEL_SKIP_FRAMES = 10
    FP_PREDICT_EVERY = 30

    def __init__(self, config, thermal_config, headers, classify=True,
                 detect_after=None, recorder=None, seed=None):
        self.config = config
        self.thermal_config = thermal_config
        self.headers = headers
        self.classify = classify
        self.seed = seed
        self.frame_num = 0
        self.predictions = {}
        self.monitored_tracks = {}
        self.recording = False
        self.tracking_events = thermal_config.motion.tracking_events
        self.classifier = None
        self.fp_model = None
        self.classifier_initialised = False
        self.fp_index = None
        self.next_classify_frame = 0
        self.next_fp_classification_frame = 0
        # timing accounting (reference piclassifier.py:117-127)
        self.process_time = 0.0
        self.tracking_time = 0.0
        self.identify_time = 0.0
        self.fp_identify_time = 0.0
        self.rec_time = 0.0
        self.total_time = 0.0
        self.fps_timer = deque(maxlen=9)

        model = None
        fp_config = None
        for mc in config.models:
            if mc.type == "RandomForest":
                fp_config = mc
            else:
                model = mc
        if classify and model is not None:
            self.classifier = get_interpreter(model, seed=seed)
            self.frames_per_classify = self.classifier.params.square_width ** 2
            self.predict_from_last = self.frames_per_classify * 2
            self.max_keep_frames = self.frames_per_classify * 2
            self.predictions[model.id] = Predictions(
                self.classifier.labels, model, self.classifier.thresholds
            )
            # streaming uses ALL_RANDOM (reference piclassifier.py:438-441)
            self.classifier.params["segment_types"] = ["ALL_RANDOM"]
            try:
                self.fp_index = self.classifier.labels.index("false-positive")
            except ValueError:
                self.fp_index = None
        else:
            self.frames_per_classify = 25
            self.predict_from_last = 50
            self.max_keep_frames = 50
        if classify and fp_config is not None:
            self.fp_model = get_interpreter(fp_config)
            self.predictions[self.fp_model.id] = Predictions(
                self.fp_model.labels, fp_config, self.fp_model.thresholds
            )

        # IR cameras swap the motion detector, recorder class, and tracking
        # step (reference piclassifier.py:157 init_ir vs init_thermal)
        self.type = "IR" if headers.model == "IR" else "thermal"
        if self.type == "IR":
            from classifier_pipeline_tpu.pipeline.motiondetector import (
                IRMotionDetector,
            )

            self.motion_detector = IRMotionDetector(thermal_config, headers)
            default_rec = IRRecorder
            # reference init_ir_tracking: classify cadence tightens to every
            # 3rd frame at 10 fps
            self.SKIP_FRAMES = 3
        else:
            self.motion_detector = CPTVMotionDetector(
                thermal_config,
                thermal_config.motion.dynamic_thresh,
                headers,
                detect_after=detect_after,
            )
            default_rec = CPTVRecorder
        if recorder is not None:
            self.recorder = recorder
            if getattr(recorder, "on_recording_stopping", None) is None:
                recorder.on_recording_stopping = self.on_recording_stopping
        else:
            rec = default_rec(
                thermal_config, headers,
                on_recording_stopping=self.on_recording_stopping,
            )
            if thermal_config.throttler.activate:
                rec = ThrottledRecorder(
                    rec, thermal_config, headers, self.on_recording_stopping
                )
            self.recorder = rec
        # snapshot recorder (dbus TakeSnapshot; reference piclassifier.py
        # take_snapshot:896-905) — short fixed-length test recordings
        self.snapshot_recorder = (
            default_rec(thermal_config, headers, name="SnapshotRecorder",
                        file_suffix="-snapshot")
            if recorder is None
            else DummyRecorder(thermal_config, headers, name="SnapshotRecorder")
        )
        # constant recorder (reference constant_recorder wiring :918-931)
        self.constant_recorder = None
        if thermal_config.recorder.constant_recorder:
            self.constant_recorder = default_rec(
                thermal_config, headers, name="ConstantRecorder",
                constant_recorder=True,
            )

        if self.type == "IR":
            import dataclasses

            from classifier_pipeline_tpu.pipeline.ir_extractor import ir_params
            from classifier_pipeline_tpu.pipeline.streamtracker import (
                IRStreamingTracker,
            )

            self.tracker_params = dataclasses.replace(
                ir_params(scale=0.25),
                res_x=headers.res_x, res_y=headers.res_y,
            )
            self.background_thresh = self.tracker_params.background_thresh
            self.tracker = IRStreamingTracker(
                self.tracker_params, fps=headers.fps
            )
        else:
            th = threshold_for_model(headers.model)
            self.background_thresh = th["background_thresh"]
            self.tracker_params = TrackingParams(
                background_thresh=float(th["background_thresh"]),
                weight_add=1.0 if headers.model == "lepton3.5" else 0.1,
                external_background=True,
                emit_filtered=True,
                # CPU streaming: the in-scan median search is too slow per
                # frame on one core, so fetch the mask and compute thumb
                # stats on host
                emit_mask=True,
                thumb_stats=False,
                res_x=headers.res_x,
                res_y=headers.res_y,
            )
            self.tracker = StreamingTracker(self.tracker_params, fps=headers.fps)
        # compile the streaming step now, before any frame arrives (the
        # reference similarly front-loads model loading before the camera
        # handshake)
        self.tracker.warmup()
        self.service = SnapshotService(
            headers=headers,
            labels=self.classifier.labels if self.classifier else [],
        )
        # Frame ring for classification: persistent circular buffers, not a
        # deque of per-frame arrays. The classify context hands these VERY
        # buffers to the jitted programs (zero-copy on CPU), so building a
        # context costs nothing per call — the old stack-and-pad rebuilt
        # ~160 MB per cadence tick at IR resolution. Slot order is ring
        # order, not chronological; ClipContext maps frame_number -> row,
        # and nothing downstream assumes sorted rows.
        self._ring_cap = max(64, self.max_keep_frames + 14)
        self._buf_thermal = np.zeros(
            (self._ring_cap, headers.res_y, headers.res_x), np.uint16
        )
        self._buf_filtered = np.zeros(
            (self._ring_cap, headers.res_y, headers.res_x), np.float32
        )
        self._buf_medians = np.zeros((self._ring_cap,), np.float32)
        self._buf_frames = [None] * self._ring_cap
        self._ring_len = 0
        self.output_dir = Path(thermal_config.recorder.output_dir)
        # Fix the streaming classify shapes and compile them NOW, with the
        # tracker warmup, so no XLA compile ever stalls the live loop. Every
        # classify (cadence predicts AND the end-of-clip pass) references
        # only frames still in the ring, so the ring capacity bounds both
        # the region axis and the track axis; S is the one segment per
        # cadence tick.
        cap8 = -(-self._ring_cap // 8) * 8
        for m in (self.classifier, self.fp_model):
            if m is not None and hasattr(m, "streaming_caps"):
                m.streaming_caps = (cap8, cap8, 1)
        if self.classify:
            self.startup_classifier()

    # ----------------------------------------------------------- helpers ---

    def startup_classifier(self):
        if self.classifier_initialised:
            return
        self.classifier_initialised = True
        if self.classifier is None:
            return
        num_inputs, in_shape = self.classifier.shape()
        self.classifier.predict(np.zeros((1, *in_shape[1:]), np.float32))
        # compile the fused streaming predict programs at their fixed
        # shapes (see interpreter.warmup_streaming)
        for m in (self.classifier, self.fp_model):
            if m is not None and hasattr(m, "warmup_streaming"):
                m.warmup_streaming(self._ring_cap, self.headers.res_y,
                                   self.headers.res_x)

    def _bg_rational(self):
        avg = self.motion_detector._background.average
        if isinstance(avg, (int, np.integer)):
            return int(avg), 1
        # initial float average: num/den rational over the crop
        cx, cy, cw, ch = self.motion_detector.crop_rectangle
        den = cw * ch
        return int(round(avg * den)), den

    def _ffc(self, frame):
        from classifier_pipeline_tpu.pipeline.motiondetector import is_affected_by_ffc

        return is_affected_by_ffc(frame)

    def _ring_append(self, t_idx, thermal_u16, filtered_f32):
        slot = self._ring_len % self._ring_cap
        self._buf_thermal[slot] = thermal_u16
        self._buf_filtered[slot] = filtered_f32
        self._buf_medians[slot] = np.median(self._buf_thermal[slot])
        self._buf_frames[slot] = int(t_idx)
        self._ring_len += 1

    def _clip_context(self):
        if self._ring_len == 0:
            return None
        # hand the persistent ring buffers to the context directly: fixed
        # capacity shape for jit (no per-call pad or copy); unfilled slots
        # carry unique negative sentinels so nothing can look them up
        numbers = [fn if fn is not None else -(s + 1)
                   for s, fn in enumerate(self._buf_frames)]
        ctx = ClipContext(self._buf_thermal, self._buf_filtered, [],
                          frame_numbers=numbers, medians=self._buf_medians)
        ctx.background = np.asarray(
            self.motion_detector.background, np.float32
        )
        return ctx

    # ------------------------------------------------------------- clip ----

    def new_clip(self, preview_frames, received_at):
        self.tracker.start_clip()
        self._ring_len = 0
        self._buf_frames = [None] * self._ring_cap
        self.next_classify_frame = 0
        self.next_fp_classification_frame = 0
        for p in self.predictions.values():
            p.clear_predictions()
        self.monitored_tracks = {}
        # track the preview frames (reference start_tracking over preview)
        for f in preview_frames:
            self._track_frame(f, received_at)

    @staticmethod
    def _gray(pix):
        pix = np.asarray(pix)
        if pix.ndim == 3:
            pix = pix.mean(axis=2).astype(np.uint8)
        return pix

    def _track_frame(self, frame, received_at):
        if self.type == "IR":
            gray = self._gray(frame.pix)
            # per-frame foreground probe (learning_rate=0: state untouched)
            mask = self.motion_detector._background.compute_filtered(gray)
            new_tracks, rows = self.tracker.process_frame(gray, mask)
            t_idx = self.tracker.current_frame
            self._ring_append(t_idx, gray, mask)
        else:
            bg = self.motion_detector.background
            num, den = self._bg_rational()
            new_tracks, rows = self.tracker.process_frame(
                frame.pix, bg, num, den, self._ffc(frame)
            )
            t_idx = self.tracker.current_frame
            self._ring_append(t_idx, frame.pix, rows.filtered)
            self._update_thumbnails(frame, rows, t_idx)
        for t in new_tracks:
            t.received_at = received_at
        return new_tracks

    def _update_thumbnails(self, frame, rows, t_idx):
        """Incremental per-track thumbnail scoring (reference
        piclassifier.update_thumbnail:708-844): keep the best-scoring
        region stat seen so far for each live track."""
        from classifier_pipeline_tpu.classify import thumbnail
        from classifier_pipeline_tpu.track import tracker_jax

        use_rows = self.tracker_params.thumb_stats
        median = None
        mask = None
        contours = np.asarray(rows.contours) if use_rows else None
        median_raw = np.asarray(rows.median_raw) if use_rows else None
        active = self.tracker.active_tracks
        for k, track in self.tracker.tracks.items():
            if track not in active:
                continue
            b = track.last_bound
            if b is None or b.blank or b.mass == 0 or b.frame_number != t_idx:
                continue
            if median is None:
                median = float(np.median(frame.pix))
            if use_rows:
                # device-computed stats for this slot's matched component
                points = int(contours[k])
                if points == 0:
                    continue
                median_diff = float(median_raw[k] - median)
            else:
                if mask is None:
                    mask = tracker_jax.unpack_mask(np.asarray(rows.mask))
                sub = mask[b.y : b.bottom, b.x : b.right]
                points = thumbnail.largest_boundary_length(sub)
                if points == 0:
                    continue
                thermal_sub = np.asarray(frame.pix)[
                    b.y : b.bottom, b.x : b.right
                ]
                masked = thermal_sub[sub > 0]
                if masked.size == 0:
                    continue
                median_diff = float(np.median(masked) - median)
            stat = thumbnail.Stat(b, points, median_diff)
            best = getattr(track, "thumb_stat", None)
            # relative score vs the track's own running maxima
            maxima = getattr(track, "thumb_maxima", [1, 1.0, 1])
            maxima = [
                max(maxima[0], b.mass),
                max(maxima[1], median_diff),
                max(maxima[2], points),
            ]
            track.thumb_maxima = maxima
            s = thumbnail.score(stat, maxima[0], maxima[1], 0, maxima[2])
            if best is None or s > best[0]:
                track.thumb_stat = (s, stat)

    # ---------------------------------------------------------- cascade ----

    def get_active_tracks(self):
        return [t for t in self.tracker.active_tracks if len(t) >= 8]

    def get_best_prediction(self, track_id):
        if self.classifier is not None:
            p = self.predictions[self.classifier.id].prediction_for(track_id)
            if p is not None and p.num_frames_classified > 0:
                return p, self.classifier.id
        if self.fp_model is not None:
            p = self.predictions[self.fp_model.id].prediction_for(track_id)
            if p is not None:
                return p, self.fp_model.id
        return None, None

    def identify_last_frame(self):
        current_frame = self.tracker.current_frame
        if (
            self.next_fp_classification_frame >= current_frame
            and self.next_classify_frame >= current_frame
        ):
            return False
        self.next_fp_classification_frame += self.FP_MODEL_SKIP_FRAMES
        active_tracks = self.get_active_tracks()
        if len(active_tracks) == 0:
            return False
        new_prediction = False
        ctx = self._clip_context()
        if ctx is None:
            return False

        if self.fp_model is not None:
            fp_start = time.time()
            for track in active_tracks:
                if self.classifier is not None:
                    full = self.predictions[self.classifier.id].prediction_for(
                        track.track_id
                    )
                    if full is not None and full.num_frames_classified > 0:
                        continue
                tp = self.predictions[self.fp_model.id].get_or_create_prediction(
                    track
                )
                if (
                    tp.last_frame_classified is not None
                    and current_frame - tp.last_frame_classified
                    < self.FP_PREDICT_EVERY
                ):
                    continue
                result = self.fp_model.predict_track(
                    ctx,
                    track,
                    predict_from_last=45,
                    max_frames=self.FP_PREDICT_EVERY // 5,
                    num_predictions=1,
                    last_frame_predicted=tp.last_frame_classified,
                )
                if result is None:
                    tp.last_frame_classified = current_frame
                    continue
                frames, prediction, mass = result
                tp.classified_frames(frames, prediction, mass)
                new_prediction = True
            self.fp_identify_time += time.time() - fp_start

        if self.classifier is not None and self.next_classify_frame <= current_frame:
            id_start = time.time()
            self.next_classify_frame += self.SKIP_FRAMES
            for track in self.get_active_animal_tracks_for_predicting():
                tp = self.predictions[self.classifier.id].get_or_create_prediction(
                    track
                )
                result = self.classifier.predict_recent_frames(
                    ctx,
                    track,
                    predict_from_last=self.predict_from_last,
                    num_predictions=1,
                    last_frame_predicted=tp.last_frame_classified,
                )
                if result is None:
                    tp.last_frame_classified = current_frame
                    continue
                prediction, frames, mass = result
                tp.classified_frames(frames, prediction, mass)
                logging.info(
                    "Track %s predicted as %s",
                    track.track_id,
                    tp.predicted_tag(),
                )
                new_prediction = True
            self.identify_time += time.time() - id_start

        if self.tracking_events:
            for track in active_tracks:
                tp, model_id = self.get_best_prediction(track.track_id)
                if tp is None:
                    continue
                if tp.predicted_tag() != "false-positive":
                    tp.tracking = True
                    self.monitored_tracks[track.track_id] = track
                elif tp.tracking:
                    tp.tracking = False
                    tp.normalize_score()
                    self.service.tracking(
                        0, track, tp.class_best_score, track.last_bound, False,
                        tp.last_frame_classified,
                        self.predictions[model_id].labels, model_id,
                        track.received_at,
                    )
                    self.monitored_tracks.pop(track.track_id, None)
        return new_prediction

    def get_active_animal_tracks_for_predicting(self):
        active = self.get_active_tracks()
        filtered = []
        least_fp = None
        current_frame = self.tracker.current_frame
        for track in active:
            if self.fp_model is not None:
                pred, _ = self.get_best_prediction(track.track_id)
                if pred is not None and pred.predicted_tag() == "false-positive":
                    conf = pred.class_best_score[pred.best_label_index] / np.sum(
                        pred.class_best_score
                    )
                    if conf >= 0.7:
                        if least_fp is None or least_fp[0] > conf:
                            least_fp = (conf, track)
                        continue
            pred = None
            if self.classifier is not None:
                pred = self.predictions[self.classifier.id].prediction_for(
                    track.track_id
                )
            if pred is not None:
                classify_every = (
                    self.PREDICT_EVERY // 2
                    if len(pred.predictions) < 2
                    else self.PREDICT_EVERY
                )
                if (
                    pred.last_frame_classified is not None
                    and current_frame - pred.last_frame_classified < classify_every
                ):
                    continue
            filtered.append(track)
        if not filtered:
            return [least_fp[1]] if least_fp else []
        filtered.sort(key=self._animal_ranking, reverse=True)
        return filtered[: self.NUM_CONCURRENT_TRACKS]

    def _animal_ranking(self, track):
        tp, _ = self.get_best_prediction(track.track_id)
        if tp is None or tp.class_best_score is None or tp.fp_index is None:
            return 0
        total = np.sum(tp.class_best_score)
        if total == 0:
            return 0
        return 1 - tp.class_best_score[tp.fp_index] / total

    # ------------------------------------------------------------- loop ----

    def process_frame(self, lepton_frame, received_at=None):
        received_at = received_at or time.time()
        start = time.time()
        if (
            self.motion_detector.can_record()
            and not self.classifier_initialised
            and self.classify
        ):
            self.startup_classifier()
        self.motion_detector.process_frame(lepton_frame)
        self.process_time += time.time() - start

        if self.snapshot_recorder.recording:
            self.snapshot_recorder.process_frame(False, lepton_frame, received_at)
        if self.constant_recorder is not None and self.motion_detector.can_record():
            if self.constant_recorder.recording:
                self.constant_recorder.process_frame(True, lepton_frame, received_at)
            else:
                self.constant_recorder.start_recording(
                    self.motion_detector.background, [],
                    self.motion_detector.temp_thresh, time.time(),
                )

        if (
            not self.recorder.recording
            and self.motion_detector.movement_detected
            and not getattr(lepton_frame, "ffc_imminent", False)
            and getattr(lepton_frame, "ffc_status", 0) not in (1, 2)
        ):
            r_start = time.time()
            preview_frames = self.motion_detector.preview_frames()
            self.recording = self.recorder.start_recording(
                self.motion_detector.background,
                preview_frames,
                self.motion_detector.temp_thresh,
                received_at,
            )
            self.rec_time += time.time() - r_start
            if self.recording:
                if self.tracking_events:
                    self.service.recording(received_at, True)
                t_start = time.time()
                self.new_clip(preview_frames, received_at)
                self.tracking_time += time.time() - t_start

        if self.recorder.recording:
            t_start = time.time()
            self._track_frame(lepton_frame, received_at)
            self.tracking_time += time.time() - t_start
            r_start = time.time()
            self.recorder.process_frame(
                self.motion_detector.movement_detected, lepton_frame, received_at
            )
            self.rec_time += time.time() - r_start
            if self.classify and not self.motion_detector.calibrating:
                self.identify_last_frame()
        elif self.tracker.carry is not None and self.tracker.tracks:
            self.end_clip()

        if not self.recorder.recording and self.recording and self.tracking_events:
            self.recording = False
            self.service.recording(received_at, False)

        self.frame_num += 1
        self.total_time += time.time() - start
        self.fps_timer.append(time.time() - start)
        if (
            self.motion_detector.can_record()
            and self.frame_num % self.DEBUG_EVERY == 0
            and self.total_time > 0
        ):
            logging.debug(
                "tracking %.1f%% process %.1f%% identify %.1f%% fp %.1f%% rec %.1f%% fps %.1f",
                100 * self.tracking_time / self.total_time,
                100 * self.process_time / self.total_time,
                100 * self.identify_time / self.total_time,
                100 * self.fp_identify_time / self.total_time,
                100 * self.rec_time / self.total_time,
                1.0 / max(np.mean(self.fps_timer), 1e-9),
            )

    def end_clip(self):
        if self.tracker.tracks:
            logging.info(
                "Clip ended with %d tracks (%d active)",
                len(self.tracker.tracks),
                len(self.tracker.active_tracks),
            )
        self.tracker.tracks = {}
        self.tracker.active_slots = set()
        self.tracker.carry = None

    def _filter_tracks_for_metadata(self):
        """End-of-recording track filtering (reference on_recording_stopping
        calls apply_track_filtering — piclassifier.py:1183,
        cliptracker.py:85-91): trim + the same filter rules the batch
        extractor applies; only surviving tracks reach the metadata."""
        from classifier_pipeline_tpu.pipeline.extractor import (
            threshold_for_model,
        )
        from classifier_pipeline_tpu.track import postprocess

        tracks = self.tracker.all_tracks()
        if self.type == "IR":
            # reference IR tracking config (trackingconfig.py:186-187
            # track_min_offset=20) rescaled by the detection scale
            # (trackingconfig.rescale:234 — the Pi runs detect at 0.25)
            scale = getattr(self.tracker_params, "detect_scale", 1.0) or 1.0
            filter_cfg = {
                "track_min_delta": 1.0,
                "track_max_delta": 150,
                "track_min_offset": 20 * scale,
                "track_min_mass": 2.0 * scale,
                "min_duration_secs": 0,
            }
        else:
            th = threshold_for_model(self.headers.model)
            filter_cfg = dict(
                track_min_delta=th["track_min_delta"],
                track_max_delta=th["track_max_delta"],
            )
            tracking = (
                self.config.get("tracking", {}).get("thermal", {})
                if self.config else {}
            )
            for k in ("max_tracks", "min_moving_frames", "max_blank_percent",
                      "max_jitter"):
                if tracking.get(k) is not None:
                    filter_cfg[k] = tracking[k]
            filter_cfg.update(tracking.get("filters", {}) or {})
            if self.config:
                filter_cfg.update(self.config.get("filters", {}))
        good, _ = postprocess.filter_tracks(
            tracks, self.tracker_params, filter_cfg
        )
        return sorted(good, key=lambda t: t.track_id)

    def on_recording_stopping(self, filename):
        """Write metadata sidecar (reference on_recording_stopping:1171-1242)."""
        meta = {"tracks": []}
        for track in self._filter_tracks_for_metadata():
            info = track.get_metadata()
            thumb = getattr(track, "thumb_stat", None)
            if thumb is not None:
                s, stat = thumb
                info["thumbnail"] = {
                    "region": stat.region.meta_dict(),
                    "contours": int(stat.contours),
                    "median_diff": float(stat.median_diff),
                    "score": round(s),
                }
            preds = []
            for model_id, registry in self.predictions.items():
                tp = registry.prediction_for(track.track_id)
                if tp is None:
                    continue
                if not tp.normalized:
                    tp.normalize_score()
                pm = tp.get_metadata(registry.thresholds)
                pm["model_id"] = model_id
                preds.append(pm)
            info["predictions"] = preds
            meta["tracks"].append(info)
        meta_name = Path(filename).with_suffix(".txt")
        with open(meta_name, "w") as f:
            json.dump(meta, f, indent=4, default=_json_default)
        logging.info("Wrote metadata %s", meta_name)

    def take_snapshot(self):
        """dbus TakeSnapshot: record a short fixed-length test clip
        (reference piclassifier.py:896-905)."""
        started = self.snapshot_recorder.start_recording(
            None, [], self.motion_detector.temp_thresh, time.time()
        )
        if not started:
            logging.info("Already taking snapshot recording")
            return False
        self.snapshot_recorder.write_until = 2 * self.headers.fps
        return True

    def disconnected(self):
        self.motion_detector.disconnected()
        self.recorder.force_stop()
        self.snapshot_recorder.force_stop()
        if self.constant_recorder is not None:
            self.constant_recorder.force_stop()
        if self.tracker.carry is not None:
            self.end_clip()

    @property
    def res_x(self):
        return self.headers.res_x

    @property
    def res_y(self):
        return self.headers.res_y
