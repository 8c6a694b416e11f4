"""Recorders (reference src/piclassifier/{recorder,cptvrecorder,
throttledrecorder,dummyrecorder}.py).

CPTV encoding runs on a writer thread fed by a queue so the 9 fps frame loop
never blocks on gzip (the native codec releases the GIL inside zlib). The
token-bucket throttler and min/max-frame semantics match the reference.
"""

from __future__ import annotations

import logging
import queue
import shutil
import threading
import time
from datetime import datetime
from pathlib import Path

import numpy as np

from classifier_pipeline_tpu.cptv import CptvHeader, CptvWriter
from classifier_pipeline_tpu.services.eventreporter import log_event, throttled_event

TEMP_DIR = "temp"
CPTV_EXT = ".cptv"


class Recorder:
    """Base recorder: min/max frame bounds, temp->final rename, disk gate."""

    def __init__(self, thermal_config, headers, name, file_extention,
                 constant_recorder=False, on_recording_stopping=None,
                 file_suffix=None):
        self.file_suffix = file_suffix
        self.file_extention = file_extention
        self.name = name
        self.constant_recorder = constant_recorder
        self.location_config = thermal_config.location
        self.device_config = thermal_config.device
        self.output_dir = Path(thermal_config.recorder.output_dir)
        if constant_recorder:
            self.output_dir = self.output_dir / "constant-recordings"
        if thermal_config.motion.run_classifier and getattr(
            thermal_config.motion, "postprocess", False
        ):
            self.output_dir = self.output_dir / "postprocess"
        self.temp_dir = self.output_dir / TEMP_DIR
        self.temp_dir.mkdir(parents=True, exist_ok=True)
        self.motion = thermal_config.motion
        self.preview_secs = thermal_config.recorder.preview_secs
        self.filename = None
        self.recording = False
        self.frames = 0
        self.headers = headers
        self.min_disk_space_mb = thermal_config.recorder.min_disk_space_mb
        self.min_frames = thermal_config.recorder.min_secs * headers.fps
        self.max_frames = thermal_config.recorder.max_secs * headers.fps
        self.min_recording = self.preview_secs * headers.fps + self.min_frames
        self.write_until = 0
        self.rec_time = 0
        self.on_recording_stopping = on_recording_stopping

    def process_frame(self, movement_detected, cptv_frame, received_at):
        if self.recording:
            self.write_frame(cptv_frame)
            if movement_detected:
                self.write_until = self.frames + self.min_frames
            elif self.has_minimum():
                self.stop_recording(received_at)
                return
            if self.frames == self.max_frames:
                self.stop_recording(received_at)

    def has_minimum(self):
        return self.frames >= self.write_until

    def can_record(self, frame_time):
        _, _, free = shutil.disk_usage(self.output_dir)
        free_mb = free * 1e-6
        if free_mb <= self.min_disk_space_mb:
            logging.warning(
                "%s cannot record: %.0f MB free, need %s MB",
                self.name, free_mb, self.min_disk_space_mb,
            )
        return free_mb > self.min_disk_space_mb

    def force_stop(self):
        if not self.recording:
            return
        if self.frames > self.min_recording:
            self.stop_recording(time.time())
        else:
            logging.info("%s stopped early, deleting short recording", self.name)
            self.delete_recording()

    def start_recording(self, background_frame, preview_frames, temp_thresh,
                        frame_time):
        if self.constant_recorder:
            self.delete_excess()
        if self.recording:
            logging.warning("%s already recording", self.name)
            return False
        self.frames = 0
        self.filename = self.new_temp_name(frame_time)
        if not self.new_recording(
            background_frame, preview_frames, temp_thresh, frame_time
        ):
            return False
        self.write_until = self.frames + self.min_frames
        self.recording = True
        logging.info("%s recording %s started temp_thresh: %s",
                     self.name, self.filename, temp_thresh)
        return True

    def stop_recording(self, frame_time):
        self.recording = False
        final_name = self.final_name()
        self._finish_writer()
        self.write_until = 0
        if self.on_recording_stopping is not None:
            self.on_recording_stopping(final_name)
        self.filename.rename(final_name)
        logging.info("%s recording %s ended, %s frames", self.name, final_name,
                     self.frames)

    def delete_excess(self):
        stat = shutil.disk_usage(self.output_dir)
        free_percent = stat[2] / stat[0]
        recordings = sorted(self.output_dir.glob(f"*{self.file_extention}"))
        while free_percent < 0.3 and recordings:
            logging.info("Deleting %s", recordings[0])
            recordings[0].unlink()
            meta = recordings[0].with_suffix(".txt")
            if meta.exists():
                meta.unlink()
            recordings = recordings[1:]
            stat = shutil.disk_usage(self.output_dir)
            free_percent = stat[2] / stat[0]

    def new_temp_name(self, frame_time):
        file_name = datetime.fromtimestamp(frame_time).strftime("%Y%m%d-%H%M%S.%f")
        if self.file_suffix is not None:
            file_name = f"{file_name}{self.file_suffix}"
        return self.temp_dir / f"{file_name}{self.file_extention}"

    def final_name(self):
        return self.output_dir / self.filename.with_suffix(self.file_extention).name

    # subclass hooks
    def new_recording(self, background_frame, preview_frames, temp_thresh,
                      frame_time):
        raise NotImplementedError

    def write_frame(self, frame):
        raise NotImplementedError

    def delete_recording(self):
        raise NotImplementedError

    def _finish_writer(self):
        pass


class CPTVRecorder(Recorder):
    def __init__(self, thermal_config, headers, name="CPTVRecorder", **args):
        super().__init__(thermal_config, headers, name, CPTV_EXT, **args)
        self._q = None
        self._thread = None

    def new_recording(self, background_frame, preview_frames, temp_thresh,
                      frame_time):
        self.frames = 0
        if not self.can_record(frame_time):
            return False
        header = CptvHeader(
            timestamp_us=int(time.time() * 1e6),
            x_resolution=self.headers.res_x,
            y_resolution=self.headers.res_y,
            devicename=self.device_config.name or "",
            model=self.headers.model or "",
            brand=self.headers.brand or "",
            device_id=self.device_config.device_id,
            fps=self.headers.fps,
            preview_secs=self.preview_secs,
            latitude=self.location_config.latitude,
            longitude=self.location_config.longitude,
            has_background=background_frame is not None,
        )
        self._q = queue.Queue()
        self._thread = threading.Thread(
            target=_record_worker,
            args=(self._q, self.filename, header, background_frame),
            daemon=True,
        )
        self._thread.start()
        for f in preview_frames or []:
            self.write_frame(f)
        return True

    def write_frame(self, frame):
        self._q.put(frame)
        self.frames += 1

    def _finish_writer(self):
        if self._thread is not None:
            self._q.put(None)
            self._thread.join()
            self._thread = None

    def delete_recording(self):
        if self.recording:
            self._finish_writer()
            self.recording = False
        if self.filename and self.filename.exists():
            self.filename.unlink()


def _record_worker(q, filename, header, background_frame):
    frames = 0
    try:
        writer = CptvWriter(filename, header)
        if background_frame is not None:
            writer.write_frame(np.asarray(background_frame, np.uint16),
                               is_background=True)
        while True:
            frame = q.get()
            if frame is None:
                break
            pix = frame.pix if hasattr(frame, "pix") else frame
            time_on = getattr(frame, "time_on", 0) or 0
            last_ffc = getattr(frame, "last_ffc_time", 0) or 0
            writer.write_frame(
                np.asarray(pix, np.uint16),
                time_on_ms=int(time_on),
                last_ffc_ms=int(last_ffc),
            )
            frames += 1
        writer.close()
    except Exception as ex:  # pragma: no cover
        logging.error("Error recording %s", filename, exc_info=True)
        log_event("error-recording", str(ex))
    logging.info("Recorder %s written %s frames", filename, frames)


class IRRecorder(Recorder):
    """IR camera mp4 recorder (reference irrecorder.py): background frame
    (grey replicated to 3 channels) then preview frames then live frames
    through an MPEG writer on its own thread, mirroring the reference's
    record subprocess."""

    VIDEO_EXT = ".mp4"

    def __init__(self, thermal_config, headers, name="IRRecorder", **args):
        super().__init__(thermal_config, headers, name, self.VIDEO_EXT, **args)
        self._q = None
        self._thread = None
        self.fps = headers.fps

    @staticmethod
    def _rgb(frame):
        pix = frame.pix if hasattr(frame, "pix") else frame
        pix = np.asarray(pix)
        if pix.ndim == 2:
            pix = np.repeat(pix[:, :, None], 3, axis=2)
        else:
            pix = pix[:, :, ::-1]  # camera frames are BGR
        return np.ascontiguousarray(pix, np.uint8)

    def new_recording(self, background_frame, preview_frames, temp_thresh,
                      frame_time):
        self.frames = 0
        if not self.can_record(frame_time):
            return False
        self._q = queue.Queue()
        self._thread = threading.Thread(
            target=_ir_record_worker,
            args=(self._q, self.filename, self.fps),
            daemon=True,
        )
        self._thread.start()
        if background_frame is not None and np.ndim(background_frame) == 2:
            self.write_frame(background_frame)
        for f in preview_frames or []:
            self.write_frame(f)
        return True

    def write_frame(self, frame):
        self._q.put(self._rgb(frame))
        self.frames += 1

    def _finish_writer(self):
        if self._thread is not None:
            self._q.put(None)
            self._thread.join()
            self._thread = None

    def final_name(self):
        out = self.output_dir / self.filename.name
        # no-ffmpeg environments fall back to an animated GIF
        if not self.filename.exists() and self.filename.with_suffix(
                ".gif").exists():
            self.filename = self.filename.with_suffix(".gif")
            out = out.with_suffix(".gif")
        return out

    def stop_recording(self, frame_time):
        # close the writer BEFORE resolving the final name: the gif
        # fallback only materializes at close
        self.recording = False
        self._finish_writer()
        final_name = self.final_name()
        self.write_until = 0
        if self.on_recording_stopping is not None:
            self.on_recording_stopping(final_name)
        self.filename.rename(final_name)
        logging.info("%s recording %s ended, %s frames", self.name,
                     final_name, self.frames)

    def delete_recording(self):
        if self.recording:
            self._finish_writer()
            self.recording = False
        name = self.final_name()  # resolves the gif fallback
        if self.filename and self.filename.exists():
            self.filename.unlink()


def _ir_record_worker(q, filename, fps):
    from classifier_pipeline_tpu.io.mpeg_creator import MPEGCreator

    frames = 0
    try:
        writer = MPEGCreator(filename, fps=fps)
        while True:
            rgb = q.get()
            if rgb is None:
                break
            writer.next_frame(rgb)
            frames += 1
        writer.close()
    except Exception as ex:  # pragma: no cover
        logging.error("Error recording %s", filename, exc_info=True)
        log_event("error-recording", str(ex))
    logging.info("IR recorder %s written %s frames", filename, frames)


class DummyRecorder(Recorder):
    """No-op recorder for tests/replay (reference dummyrecorder.py)."""

    def __init__(self, thermal_config, headers, name="DummyRecorder", **args):
        super().__init__(thermal_config, headers, name, CPTV_EXT, **args)

    def new_recording(self, background_frame, preview_frames, temp_thresh,
                      frame_time):
        self.frames = len(preview_frames or [])
        return True

    def write_frame(self, frame):
        self.frames += 1

    def stop_recording(self, frame_time):
        self.recording = False
        self.write_until = 0
        if self.on_recording_stopping is not None:
            self.on_recording_stopping(self.filename)

    def delete_recording(self):
        self.recording = False


class ThrottledRecorder:
    """Token-bucket wrapper (reference throttledrecorder.py)."""

    def __init__(self, recorder, thermal_config, headers, on_recording_stopping=None):
        self.bucket_size = thermal_config.throttler.bucket_size * headers.fps
        self.throttling = False
        self.tokens = self.bucket_size
        self.recorder = recorder
        self.last_rec = None
        self.last_motion = None
        self.fps = headers.fps
        self.no_motion = thermal_config.throttler.no_motion
        self.max_throttling_seconds = (
            thermal_config.throttler.max_throttling_minutes * 60
        )
        self.min_recording = self.recorder.min_frames
        self.throttled_at = None
        self.constant_recorder = False

    @property
    def name(self):
        return self.recorder.name

    @property
    def recording(self):
        return self.recorder.recording

    @property
    def filename(self):
        return self.recorder.filename

    @property
    def min_frames(self):
        return self.recorder.min_frames

    @property
    def write_until(self):
        return self.recorder.write_until

    def force_stop(self):
        if self.recorder.recording:
            self.last_rec = time.time()
        self.recorder.force_stop()

    def process_frame(self, movement_detected, cptv_frame, received_at):
        if movement_detected:
            self.last_motion = received_at
        was_recording = self.recorder.recording
        self.recorder.process_frame(movement_detected, cptv_frame, received_at)
        self.take_token(received_at)
        if was_recording and not self.recorder.recording:
            self.last_rec = received_at
        if self.throttling and self.recorder.recording:
            logging.info("Throttling recording")
            self.stop_recording(received_at)

    def update_tokens(self, frame_time):
        if self.last_motion is None:
            return
        update_from = self.last_motion
        if self.last_rec and self.last_rec > self.last_motion:
            update_from = self.last_rec
        since_motion = frame_time - update_from
        if self.throttling:
            since_throttle = frame_time - self.throttled_at
            since_motion -= self.no_motion
            if since_motion < 0:
                if (
                    self.max_throttling_seconds
                    and since_throttle >= self.max_throttling_seconds
                ):
                    self.tokens = self.recorder.min_frames // 2
                else:
                    return
            else:
                self.tokens += since_motion * self.fps
        else:
            self.tokens += since_motion * self.fps
        self.throttling = False
        self.throttled_at = None
        self.tokens = min(int(self.tokens), self.bucket_size)

    def start_recording(self, background_frame, preview_frames, temp_thresh,
                        frame_time):
        self.update_tokens(frame_time)
        self.last_motion = frame_time
        if self.throttling:
            throttled_event()
            return False
        if self.tokens < self.min_recording:
            self.throttle(frame_time)
            return False
        self.take_token(frame_time, len(preview_frames or []))
        return self.recorder.start_recording(
            background_frame, preview_frames, temp_thresh, frame_time
        )

    def stop_recording(self, frame_time):
        if self.recorder.recording:
            self.last_rec = frame_time
            self.recorder.stop_recording(frame_time)

    def delete_recording(self):
        self.recorder.delete_recording()

    def throttle(self, frame_time):
        logging.info("Throttling")
        self.throttling = True
        self.throttled_at = frame_time
        throttled_event()

    def take_token(self, frame_time, num_tokens=1):
        self.tokens -= num_tokens
        if self.tokens <= 0:
            self.tokens = 0
            self.throttle(frame_time)
