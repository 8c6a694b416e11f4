"""Per-track prediction accumulation (reference src/classify/trackprediction.py).

Holds per-segment model outputs and reduces them to a per-track label with
mass-smoothing, clarity, thresholds, and metadata identical in shape to the
reference's output JSON.
"""

from __future__ import annotations

import time

import numpy as np

DEFAULT_THRESHOLD = 0.8


class Prediction:
    def __init__(self, prediction, smoothed_prediction, frames, predicted_at_frame, mass):
        self.prediction = np.asarray(prediction)
        self.smoothed_prediction = (
            None if smoothed_prediction is None else np.asarray(smoothed_prediction)
        )
        self.frames = frames
        self.predicted_at_frame = predicted_at_frame
        self.mass = mass
        self.predicted_time = time.time()

    def clarity(self):
        best = np.argsort(self.prediction)
        return self.prediction[best[-1]] - self.prediction[best[-2]]

    def get_metadata(self):
        meta = {
            "prediction": np.uint8(np.round(100 * self.prediction)).tolist(),
            "frames": [int(f) for f in np.atleast_1d(self.frames)],
            "predicted_at_frame": int(self.predicted_at_frame),
            "mass": [int(self.mass)] if np.isscalar(self.mass) else [int(m) for m in np.atleast_1d(self.mass)],
            "predicted_time": self.predicted_time,
        }
        if self.smoothed_prediction is not None:
            meta["smoothed_prediction"] = np.uint32(
                np.round(self.smoothed_prediction)
            ).tolist()
        return meta


class TrackPrediction:
    def __init__(self, track_id, labels, keep_all=True, start_frame=None, smooth_preds=False):
        try:
            self.fp_index = labels.index("false-positive")
        except ValueError:
            self.fp_index = None
        self.track_id = track_id
        self.predictions = []
        self.class_best_score = np.zeros((len(labels)))
        self.start_frame = start_frame
        self.last_frame_classified = None
        self.num_frames_classified = 0
        self.keep_all = keep_all
        self.labels = labels
        self.classify_time = None
        self.tracking = False
        self.masses = []
        self.normalized = False
        self.smooth_preds = smooth_preds

    def cap_confidences(self, max_confidence):
        max_score = np.sum(self.class_best_score)
        if max_score > max_confidence:
            self.class_best_score = self.class_best_score * (
                max_confidence / max_score
            )

    def classified_track(self, predictions, prediction_frames, masses):
        predictions = np.asarray(predictions)
        top_score = None
        smoothed_predictions = None
        if self.smooth_preds:
            masses = np.array(masses)
            top_score = np.sum(masses)
            smoothed_predictions = predictions * masses[:, None]
        self.num_frames_classified = len(predictions)
        for index, (prediction, frames, mass) in enumerate(
            zip(predictions, prediction_frames, masses)
        ):
            self.predictions.append(
                Prediction(
                    prediction,
                    smoothed_predictions[index]
                    if smoothed_predictions is not None
                    else None,
                    frames,
                    np.amax(frames),
                    mass,
                )
            )
        if self.num_frames_classified > 0:
            if smoothed_predictions is None:
                self.class_best_score = np.sum(predictions, axis=0)
            else:
                self.class_best_score = np.sum(smoothed_predictions, axis=0)
            if top_score is None:
                self.class_best_score = self.class_best_score / np.sum(
                    self.class_best_score
                )
            else:
                self.class_best_score = self.class_best_score / top_score

    def classified_frames(self, frame_numbers, predictions, masses):
        """Incremental accumulation from the streaming cascade
        (reference trackprediction.py:196-233)."""
        predictions = np.asarray(predictions)
        smoothed = None
        total_pred = None
        if not self.smooth_preds:
            total_pred = np.sum(predictions, axis=0)
        for frames, pred, mass in zip(frame_numbers, predictions, masses):
            if isinstance(frames, (list, np.ndarray)):
                self.num_frames_classified += len(frames)
            else:
                self.num_frames_classified += 1
            if self.smooth_preds:
                smoothed = pred**2 * mass
                total_pred = smoothed if total_pred is None else total_pred + smoothed
            self.last_frame_classified = int(np.amax(frames))
            p = Prediction(pred, smoothed, frames, self.last_frame_classified, mass)
            if self.keep_all:
                self.predictions.append(p)
            else:
                self.predictions = [p]
        if self.class_best_score is None:
            self.class_best_score = total_pred
        else:
            self.class_best_score = self.class_best_score + total_pred

    def classified_frame(self, frame_number, predictions, mass):
        self.last_frame_classified = frame_number
        self.num_frames_classified += 1
        self.masses.append(mass)
        smoothed = predictions**2 * mass if self.smooth_preds else None
        p = Prediction(predictions, smoothed, frame_number, frame_number, mass)
        if self.keep_all:
            self.predictions.append(p)
        else:
            self.predictions = [p]
        if self.class_best_score is None:
            self.class_best_score = smoothed if self.smooth_preds else predictions
        else:
            if self.smooth_preds:
                self.class_best_score = self.class_best_score + smoothed
            else:
                self.class_best_score = predictions

    def normalize_score(self):
        if self.class_best_score is not None:
            self.class_best_score = self.class_best_score / np.sum(
                self.class_best_score
            )
            self.normalized = True

    def get_priority(self, frame_number):
        """Classify-scheduling priority (reference :267-290)."""
        if self.tracking:
            return 100
        if self.last_frame_classified:
            skipped = frame_number - self.last_frame_classified
        else:
            skipped = frame_number - (self.start_frame or 0)
        priority = skipped / 9
        if self.num_frames_classified == 0:
            priority += 2
        if self.fp_index and self.best_label_index == self.fp_index:
            priority -= 100
        return priority

    def predicted_tag(self):
        index = self.best_label_index
        return None if index is None else self.labels[index]

    def class_confidences(self):
        return {
            self.labels[i]: round(float(v), 3)
            for i, v in enumerate(self.class_best_score)
        }

    @property
    def best_label_index(self):
        if self.class_best_score is None:
            return None
        return int(np.argmax(self.class_best_score))

    @property
    def max_score(self):
        if self.class_best_score is None:
            return None
        return float(np.amax(self.class_best_score))

    @property
    def clarity(self):
        if self.class_best_score is None or len(self.class_best_score) < 2:
            return None
        return self.max_score - self.score(2)

    def label_index(self, n=None):
        if n is None:
            return self.best_label_index
        return int(np.argsort(self.class_best_score)[-n])

    def score(self, n=None):
        if n is None:
            return self.max_score
        return float(sorted(self.class_best_score)[-n])

    def get_metadata(self, thresholds=None):
        meta = {}
        if self.classify_time is not None:
            meta["classify_time"] = round(self.classify_time, 1)
        meta["tag"] = self.predicted_tag()
        confidence = self.max_score if self.max_score else 0
        if thresholds is not None:
            threshold = thresholds[self.best_label_index]
        else:
            threshold = DEFAULT_THRESHOLD
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
        self.labels = labels
        self.prediction_per_track = {}
        self.model = model
        self.model_load_time = None
        self.thresholds = thresholds

    def get_or_create_prediction(self, track, keep_all=True, smooth_preds=False):
        return self.prediction_per_track.setdefault(
            track.track_id,
            TrackPrediction(
                track.track_id,
                self.labels,
                keep_all=keep_all,
                start_frame=track.start_frame,
                smooth_preds=smooth_preds,
            ),
        )

    def clear_predictions(self):
        self.prediction_per_track = {}

    def prediction_for(self, track_id):
        return self.prediction_per_track.get(track_id)

    @property
    def classify_time(self):
        return float(
            np.sum(
                [
                    p.classify_time
                    for p in self.prediction_per_track.values()
                    if p.classify_time is not None
                ]
            )
        )
