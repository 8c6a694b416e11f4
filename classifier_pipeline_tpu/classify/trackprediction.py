"""Per-track prediction accumulation (reference src/classify/trackprediction.py).

Reduces per-segment model outputs to a per-track label. Three accumulation
entry points mirror the reference's cadences: ``classified_track`` (batch,
whole-clip classify), ``classified_frames`` (streaming cascade bursts) and
``classified_frame`` (single-frame FP gate). Scores optionally mass-smooth
(pred^2 * mass), normalize to sum 1, and serialize to the same metadata JSON
schema (uint8 percent predictions, thresholds, clarity) the Cacophony API
consumes.
"""

from __future__ import annotations

import time

import numpy as np

DEFAULT_THRESHOLD = 0.8


def _second_best_gap(scores):
    """Distance between the top two entries."""
    order = np.argsort(scores)
    return scores[order[-1]] - scores[order[-2]]


class Prediction:
    """One model output: raw distribution + optional mass-smoothed form,
    the frames it covered, and when it was made."""

    __slots__ = ("prediction", "smoothed_prediction", "frames",
                 "predicted_at_frame", "mass", "predicted_time")

    def __init__(self, dist, smoothed, frames, at_frame, mass):
        self.prediction = np.asarray(dist)
        self.smoothed_prediction = (
            None if smoothed is None else np.asarray(smoothed))
        self.frames, self.predicted_at_frame = frames, at_frame
        self.mass, self.predicted_time = mass, time.time()

    def clarity(self):
        return _second_best_gap(self.prediction)

    def get_metadata(self):
        """JSON form: percentages as uint8, frame lists as ints (reference
        Prediction.get_metadata, trackprediction.py:75-80)."""
        mass = self.mass
        mass_list = [int(mass)] if np.isscalar(mass) else [
            int(m) for m in np.atleast_1d(mass)]
        meta = {
            "prediction": np.uint8(np.round(100 * self.prediction)).tolist(),
            "frames": [int(f) for f in np.atleast_1d(self.frames)],
            "predicted_at_frame": int(self.predicted_at_frame),
            "mass": mass_list,
            "predicted_time": self.predicted_time,
        }
        if self.smoothed_prediction is not None:
            meta["smoothed_prediction"] = np.uint32(
                np.round(self.smoothed_prediction)
            ).tolist()
        return meta


class TrackPrediction:
    """Running per-track score state (reference TrackPrediction)."""

    def __init__(self, track_id, labels, keep_all=True, start_frame=None,
                 smooth_preds=False):
        self.track_id, self.labels = track_id, labels
        self.fp_index = (labels.index("false-positive")
                         if "false-positive" in labels else None)
        self.predictions, self.masses = [], []
        self.class_best_score = np.zeros(len(labels))
        self.start_frame, self.last_frame_classified = start_frame, None
        self.num_frames_classified = 0
        self.keep_all, self.smooth_preds = keep_all, smooth_preds
        self.classify_time = None
        self.tracking = self.normalized = False

    # -- accumulation ------------------------------------------------------

    def _remember(self, pred):
        if not self.keep_all:
            del self.predictions[:]
        self.predictions.append(pred)

    def classified_track(self, dists, prediction_frames, masses):
        """Batch path: all segments of a track at once; score is the
        (optionally mass-weighted) sum normalized to 1 (reference :127-171)."""
        dists = np.asarray(dists)
        weighted = mass_total = None
        if self.smooth_preds:
            mass_col = np.array(masses)
            mass_total = np.sum(mass_col)
            weighted = dists * mass_col[:, None]
        self.num_frames_classified = dists.shape[0]
        for k, (dist, frames, mass) in enumerate(
                zip(dists, prediction_frames, masses)):
            self.predictions.append(Prediction(
                dist, None if weighted is None else weighted[k],
                frames, np.amax(frames), mass))
        if not self.num_frames_classified:
            return
        pooled = np.sum(dists if weighted is None else weighted, axis=0)
        divisor = np.sum(pooled) if mass_total is None else mass_total
        self.class_best_score = pooled / divisor

    def classified_frames(self, frame_numbers, dists, masses):
        """Streaming cascade bursts (reference :196-233)."""
        dists = np.asarray(dists)
        smoothing = self.smooth_preds
        smoothed = None
        running = None if smoothing else np.sum(dists, axis=0)
        for frames, dist, mass in zip(frame_numbers, dists, masses):
            covered = (len(frames)
                       if isinstance(frames, (list, np.ndarray)) else 1)
            self.num_frames_classified += covered
            if smoothing:
                smoothed = dist**2 * mass
                running = smoothed if running is None else running + smoothed
            self.last_frame_classified = int(np.amax(frames))
            self._remember(Prediction(dist, smoothed, frames,
                                      self.last_frame_classified, mass))
        prior = self.class_best_score
        self.class_best_score = running if prior is None else prior + running

    def classified_frame(self, frame_number, dist, mass):
        """Single-frame FP-gate path (reference :235-265). Note the
        reference quirk kept here: without smoothing the running score is
        REPLACED by the newest distribution, not accumulated."""
        self.last_frame_classified, self.num_frames_classified = (
            frame_number, self.num_frames_classified + 1)
        self.masses.append(mass)
        smoothed = dist**2 * mass if self.smooth_preds else None
        self._remember(Prediction(dist, smoothed, frame_number,
                                  frame_number, mass))
        if self.smooth_preds and self.class_best_score is not None:
            self.class_best_score = self.class_best_score + smoothed
        else:
            self.class_best_score = smoothed if self.smooth_preds else dist

    # -- score shaping -----------------------------------------------------

    def cap_confidences(self, cap):
        total = np.sum(self.class_best_score)
        if total > cap:
            self.class_best_score = self.class_best_score * (cap / total)

    def normalize_score(self):
        best = self.class_best_score
        if best is None:
            return
        self.class_best_score, self.normalized = best / np.sum(best), True

    def get_priority(self, now_frame):
        """Classify-scheduling priority: staleness in seconds-of-frames,
        bonus for never-classified, FP tracks pushed to the back
        (reference :267-290)."""
        if self.tracking:
            return 100
        since = self.last_frame_classified or self.start_frame or 0
        priority = (now_frame - since) / 9
        if not self.num_frames_classified:
            priority += 2
        is_fp = self.fp_index and self.best_label_index == self.fp_index
        return priority - 100 if is_fp else priority

    # -- readout -----------------------------------------------------------

    def predicted_tag(self):
        at = self.best_label_index
        return None if at is None else self.labels[at]

    def class_confidences(self):
        return {
            self.labels[i]: round(float(v), 3)
            for i, v in enumerate(self.class_best_score)
        }

    @property
    def best_label_index(self):
        best = self.class_best_score
        return None if best is None else int(np.argmax(best))

    @property
    def max_score(self):
        best = self.class_best_score
        return None if best is None else float(np.amax(best))

    @property
    def clarity(self):
        best = self.class_best_score
        if best is None or len(best) < 2:
            return None
        return self.max_score - self.score(rank=2)

    def label_index(self, rank=None):
        if rank is None:
            return self.best_label_index
        return int(np.argsort(self.class_best_score)[-rank])

    def score(self, rank=None):
        if rank is None:
            return self.max_score
        return float(np.sort(self.class_best_score)[-rank])

    def get_metadata(self, thresholds=None):
        """The per-track block of the output JSON (reference :465-501)."""
        meta = {}
        if self.classify_time is not None:
            meta["classify_time"] = round(self.classify_time, 1)
        meta["tag"] = self.predicted_tag()
        confidence = self.max_score or 0
        threshold = (DEFAULT_THRESHOLD if thresholds is None
                     else thresholds[self.best_label_index])
        meta["threshold_used"] = threshold
        meta["confident"] = bool(confidence >= threshold)
        meta["confidence"] = round(confidence, 2)
        meta["clarity"] = round(self.clarity, 3) if self.clarity else 0
        meta["all_class_confidences"] = self.class_confidences()
        meta["predictions"] = [p.get_metadata() for p in self.predictions]
        return meta


class Predictions:
    """Per-model registry of TrackPredictions (reference :14-60)."""

    def __init__(self, labels, model, thresholds=None):
        self.labels, self.model = labels, model
        self.prediction_per_track = {}
        self.model_load_time, self.thresholds = None, thresholds

    def get_or_create_prediction(self, track, keep_all=True,
                                 smooth_preds=False):
        return self.prediction_per_track.setdefault(
            track.track_id,
            TrackPrediction(track.track_id, self.labels, keep_all,
                            track.start_frame, smooth_preds),
        )

    def clear_predictions(self):
        self.prediction_per_track.clear()

    def prediction_for(self, track_id):
        return self.prediction_per_track.get(track_id, None)

    @property
    def classify_time(self):
        return float(np.sum([
            p.classify_time
            for p in self.prediction_per_track.values()
            if p.classify_time is not None
        ]))
