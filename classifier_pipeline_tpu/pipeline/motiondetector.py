"""Streaming motion detection (reference src/piclassifier/motiondetector.py +
cptvmotiondetector.py).

Runs per frame at camera rate (9 fps). The per-pixel math is identical to the
batch tracker's background model; this streaming variant keeps host state
(deques, trigger counters) and NumPy pixels — at 160x120@9fps the arithmetic
is microseconds and control-flow-heavy, so the TPU is reserved for the
tracking/classification steps.
"""

from __future__ import annotations

import datetime
import logging

import numpy as np

FFC_PERIOD = datetime.timedelta(seconds=9.9)


class IRMotionDetector:
    """IR camera motion detection (reference irmotiondetector.py): a rolling
    background plus the erosion trigger from the shared Background logic."""

    def __init__(self, thermal_config, headers):
        from classifier_pipeline_tpu.track.ir_background import IRBackground

        self.headers = headers
        self.config = thermal_config.motion
        self.rec_window = thermal_config.recorder.rec_window
        self.use_low_power_mode = thermal_config.recorder.use_low_power_mode
        self.num_preview_frames = thermal_config.recorder.preview_secs * headers.fps
        self.window = SlidingWindow(self.num_preview_frames + 1)
        self._background = IRBackground()
        self.movement_detected = False
        self.ffc_affected = False
        self.num_frames = 0
        self.processed = 0

    @property
    def calibrating(self):
        return False

    @property
    def background(self):
        return self._background.background

    @property
    def temp_thresh(self):
        return 0

    def preview_frames(self):
        return self.window.get_frames()[:-1]

    def get_recent_frame(self):
        return self.window.current

    def can_record(self):
        inside = self.rec_window.inside_window() if self.rec_window else True
        return inside and not self.use_low_power_mode

    def disconnected(self):
        self.window.reset()
        self.processed = 0

    def process_frame(self, frame, force_process=False):
        import numpy as np

        pix = frame.pix if hasattr(frame, "pix") else frame
        if len(pix.shape) == 3:
            pix = pix.mean(axis=2).astype(pix.dtype)
        if self.can_record() or force_process:
            self.window.add(frame)
            self._background.update_background(pix)
            if self.processed > 5:
                self.movement_detected = self._background.detect_motion()
            self.processed += 1
        else:
            self.window.update_current_frame(frame)
            self.movement_detected = False
        self.num_frames += 1
        return self.movement_detected


def is_affected_by_ffc(frame) -> bool:
    """reference cptvmotiondetector.py:211-223, including the int-milliseconds
    unit quirk (diff_ms < FFC_PERIOD.seconds)."""
    if getattr(frame, "ffc_status", None) in (1, 2):
        return True
    time_on = getattr(frame, "time_on", None)
    last_ffc = getattr(frame, "last_ffc_time", None)
    if time_on is None or last_ffc is None:
        return False
    if isinstance(time_on, int):
        return (time_on - last_ffc) < FFC_PERIOD.seconds
    return (time_on - last_ffc) < FFC_PERIOD


class SlidingWindow:
    """FFC-aware ring buffer (reference motiondetector.py:7-94)."""

    def __init__(self, size):
        self.frames = [None] * size
        self.size = size
        self.last_index = None
        self.oldest_index = None
        self.non_ffc_index = None
        self.ffc = False

    def add(self, frame, ffc=False):
        if self.last_index is None:
            self.oldest_index = 0
            self.frames[0] = frame
            self.last_index = 0
            if not ffc:
                self.non_ffc_index = 0
        else:
            new_index = (self.last_index + 1) % self.size
            if new_index == self.oldest_index:
                if self.oldest_index == self.non_ffc_index and not ffc:
                    self.non_ffc_index = (self.oldest_index + 1) % self.size
                self.oldest_index = (self.oldest_index + 1) % self.size
            self.frames[new_index] = frame
            self.last_index = new_index
        if not ffc and self.ffc:
            self.non_ffc_index = self.last_index
        self.ffc = ffc

    def update_current_frame(self, frame, ffc=False):
        if self.last_index is None:
            self.oldest_index = 0
            self.last_index = 0
            if not ffc:
                self.non_ffc_index = 0
        if not ffc and self.ffc:
            self.non_ffc_index = self.last_index
        self.frames[self.last_index] = frame
        self.ffc = ffc

    @property
    def current(self):
        return None if self.last_index is None else self.frames[self.last_index]

    @property
    def oldest(self):
        return None if self.oldest_index is None else self.frames[self.oldest_index]

    @property
    def oldest_nonffc(self):
        return (
            None if self.non_ffc_index is None else self.frames[self.non_ffc_index]
        )

    def get_frames(self):
        if self.last_index is None:
            return []
        frames = []
        cur = self.oldest_index
        end = (self.last_index + 1) % self.size
        while len(frames) == 0 or cur != end:
            frames.append(self.frames[cur])
            cur = (cur + 1) % self.size
        return frames

    def reset(self):
        self.last_index = None
        self.oldest_index = None


class RunningMean:
    """O(1) trailing-window mean (reference motiondetector.py:160-175)."""

    def __init__(self, data, window_size):
        self.running_mean = np.sum(data, axis=0, dtype=np.uint32)
        self.running_mean_frames = len(data)
        self.window_size = window_size

    def add(self, new_data, oldest_data):
        if self.running_mean_frames == self.window_size:
            self.running_mean -= oldest_data
            self.running_mean += new_data
        else:
            self.running_mean = self.running_mean + new_data
            self.running_mean_frames += 1

    def mean(self):
        return self.running_mean / self.running_mean_frames


class WeightedBackground:
    """Per-pixel min-descent background (reference motiondetector.py:178-248).
    Same math as the batch tracker's scan carry."""

    def __init__(self, edge_pixels, crop_rectangle, res_x, res_y, weight_add,
                 init_average=None):
        self.edge_pixels = edge_pixels
        self.crop = crop_rectangle  # (x, y, w, h)
        self._background = None
        self.weight_add = weight_add
        cx, cy, cw, ch = crop_rectangle
        self.background_weight = np.zeros((ch, cw))
        if init_average is not None:
            self.average = init_average

    def get_average(self):
        return self.average

    def _sub(self, frame):
        cx, cy, cw, ch = self.crop
        return frame[cy : cy + ch, cx : cx + cw]

    def process_frame(self, frame):
        frame = np.int32(self._sub(frame))
        cx, cy, cw, ch = self.crop
        if self._background is None:
            self._background = np.empty((ch + 2 * self.edge_pixels, cw + 2 * self.edge_pixels))
            self._background[
                self.edge_pixels : ch + self.edge_pixels,
                self.edge_pixels : cw + self.edge_pixels,
            ] = frame
            self.average = np.average(frame)
            self.set_background_edges()
            return
        edgeless = self._sub(self._background)
        descend = edgeless < frame - self.background_weight
        new_background = np.where(descend, edgeless, frame)
        self.background_weight = np.where(
            descend, self.background_weight + self.weight_add, 0
        )
        if np.any(new_background != edgeless):
            edgeless[:, :] = new_background
            self.average = int(round(np.average(edgeless)))
            self.set_background_edges()

    def set_background_edges(self):
        e = self.edge_pixels
        b = self._background
        for i in range(e):
            b[i] = b[e]
            b[-i - 1] = b[-e - 1]
            b[:, i] = b[:, e]
            b[:, -i - 1] = b[:, -1 - e]

    @property
    def background(self):
        return self._background


class CPTVMotionDetector:
    """Two-delta thermal motion trigger (reference cptvmotiondetector.py)."""

    BACKGROUND_WEIGHT_ADD = 0.1
    MEAN_FRAMES = 45

    def __init__(self, thermal_config, dynamic_thresh, headers, detect_after=None):
        self.headers = headers
        weight_add = self.BACKGROUND_WEIGHT_ADD
        if headers.model and headers.model.lower() == "lepton3.5":
            weight_add = 1
        self.config = thermal_config.motion
        self.rec_window = thermal_config.recorder.rec_window
        self.use_low_power_mode = thermal_config.recorder.use_low_power_mode
        self.num_preview_frames = thermal_config.recorder.preview_secs * headers.fps
        self.compare_gap = self.config.frame_compare_gap + 1
        edge = self.config.edge_pixels
        self.min_frames = thermal_config.recorder.min_secs * headers.fps
        self.max_frames = thermal_config.recorder.max_secs * headers.fps
        if not self.config.one_diff_only:
            self.diff_window = SlidingWindow(self.compare_gap)
        self.running_mean = None
        self.thermal_window = SlidingWindow(self.num_preview_frames + 1)
        self.processed = 0
        self.num_frames = 0
        self.crop_rectangle = (
            edge, edge, headers.res_x - 2 * edge, headers.res_y - 2 * edge
        )
        self._background = WeightedBackground(
            edge, self.crop_rectangle, headers.res_x, headers.res_y, weight_add,
            self.config.temp_thresh,
        )
        self.movement_detected = False
        self.dynamic_thresh = dynamic_thresh
        self.triggered = 0
        self.ffc_affected = False
        self.recording = False
        self.detect_after = (
            self.thermal_window.size * 2 if detect_after is None else detect_after
        )

    def seed_background(self, pix):
        """Replay-mode background seeding (reference piclassify.py:380-382):
        the clip's raw background frame REPLACES the weighted-background
        array outright — including its dtype, so subsequent in-place
        updates truncate to uint16 exactly as the reference replay does."""
        self._background._background = pix

    @property
    def calibrating(self):
        return self.ffc_affected

    @property
    def temp_thresh(self):
        return self._background.average

    @property
    def background(self):
        return self._background.background

    def preview_frames(self):
        return self.thermal_window.get_frames()[:-1]

    def get_recent_frame(self):
        return self.thermal_window.current

    def can_record(self):
        inside = self.rec_window.inside_window() if self.rec_window else True
        return inside and not self.use_low_power_mode

    def disconnected(self):
        self.thermal_window.reset()
        if not self.config.one_diff_only:
            self.diff_window.reset()
        self.processed = 0

    def _sub(self, frame):
        cx, cy, cw, ch = self.crop_rectangle
        return frame[cy : cy + ch, cx : cx + cw]

    def detect(self, clipped_frame):
        oldest = self._sub(self.thermal_window.oldest_nonffc.pix)
        oldest = np.clip(oldest, a_min=self.temp_thresh, a_max=None)
        clipped_frame = np.clip(clipped_frame, a_min=self.temp_thresh, a_max=None)
        delta_frame = clipped_frame - oldest
        if not self.config.warmer_only:
            delta_frame = abs(delta_frame)
        if self.config.one_diff_only:
            diff = int(np.sum(delta_frame > self.config.delta_thresh))
        else:
            if self.processed > 2:
                delta_frame2 = self.diff_window.oldest_nonffc
                delta_frame[delta_frame >= self.config.delta_thresh] = (
                    self.config.delta_thresh
                )
                delta_combined = delta_frame2 + delta_frame
                diff = int(
                    np.sum(delta_combined == self.config.delta_thresh * 2)
                )
            else:
                delta_frame[delta_frame >= self.config.delta_thresh] = (
                    self.config.delta_thresh
                )
                diff = 0
            self.diff_window.add(delta_frame, self.ffc_affected)
        return diff > self.config.count_thresh

    def process_frame(self, cptv_frame, force_process=False):
        prev_ffc = self.ffc_affected
        self.ffc_affected = is_affected_by_ffc(cptv_frame)
        if self.can_record() or force_process:
            self.thermal_window.add(cptv_frame, self.ffc_affected)
            oldest_thermal = self.thermal_window.oldest
            if oldest_thermal is not None:
                oldest_thermal = oldest_thermal.pix
            if self.running_mean is None:
                last_45 = self.thermal_window.get_frames()[: self.MEAN_FRAMES]
                last_45 = [f.pix for f in last_45]
                if last_45:
                    self.running_mean = RunningMean(last_45, self.MEAN_FRAMES)
            else:
                self.running_mean.add(cptv_frame.pix, oldest_thermal)
            if self.running_mean is not None and not self.ffc_affected:
                self._background.process_frame(self.running_mean.mean())
            if self.ffc_affected or prev_ffc:
                self.movement_detected = False
                self.triggered = 0
                if prev_ffc:
                    self.thermal_window.non_ffc_index = self.thermal_window.last_index
            elif self.processed > self.detect_after:
                cropped = np.int32(self._sub(cptv_frame.pix))
                movement = self.detect(cropped)
                if movement:
                    self.triggered += 1
                else:
                    self.triggered = 0
                self.movement_detected = self.triggered >= self.config.trigger_frames
            self.processed += 1
        else:
            self.thermal_window.update_current_frame(cptv_frame, self.ffc_affected)
            self.movement_detected = False
        self.num_frames += 1
        return self.movement_detected

    def skip_frame(self):
        return
