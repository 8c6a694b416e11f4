"""pi-classify CLI (reference src/piclassifier/piclassify.py).

Two modes:
  * socket daemon: accept leptond connections on /var/run/lepton-frames
    (YAML header handshake, then telemetry+pixel frames), with queue
    backpressure and frame dropping.
  * --file replay: feed a CPTV recording through the same
    PiClassifier.process_frame loop (how CI exercises the streaming system).
"""

from __future__ import annotations

import argparse
import logging
import os
import queue
import socket
import sys
import threading
import time
from pathlib import Path

import numpy as np

SOCKET_NAME = "/var/run/lepton-frames"
MAX_QUEUE_SECONDS = 4
DROP_EVERY = 9


def replay_file(args, config, thermal_config):
    from classifier_pipeline_tpu.cptv import load_cptv
    from classifier_pipeline_tpu.pipeline.cameras import CameraFrame, HeaderInfo
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier
    from classifier_pipeline_tpu.pipeline.recorders import DummyRecorder

    clip = load_cptv(args.file)
    h = clip.header
    headers = HeaderInfo(
        res_x=h.x_resolution, res_y=h.y_resolution, fps=h.fps or 9,
        brand=h.brand or None, model=h.model or None,
        frame_size=h.x_resolution * h.y_resolution * 2, pixel_bits=16,
        serial=h.camera_serial, firmware=h.firmware,
    )
    recorder = DummyRecorder(thermal_config, headers)
    pi = PiClassifier(
        config, thermal_config, headers,
        classify=thermal_config.motion.run_classifier and args.classify,
        detect_after=args.detect_after,
        recorder=recorder,
        seed=args.seed,
    )
    target_dt = 1.0 / args.fps if args.fps else 0
    n = 0
    start = time.time()
    from datetime import timedelta

    for frame in clip.frames():
        if frame.background_frame:
            # reference piclassify.py:380-382: the clip's background frame
            # seeds the motion-detector background and is NOT processed
            pi.motion_detector.seed_background(np.asarray(frame.pix))
            continue
        # the reference replay wraps telemetry times as timedeltas
        # (piclassify.py:369-376), selecting the timedelta branch of the
        # FFC check — replay parity requires the same
        cf = CameraFrame(
            pix=np.asarray(frame.pix),
            time_on=timedelta(milliseconds=int(frame.time_on)),
            last_ffc_time=timedelta(milliseconds=int(frame.last_ffc_time)),
            temp_c=frame.temp_c,
            last_ffc_temp_c=frame.last_ffc_temp_c,
        )
        t0 = time.time()
        pi.process_frame(cf, time.time())
        n += 1
        if target_dt:
            leftover = target_dt - (time.time() - t0)
            if leftover > 0:
                time.sleep(leftover)
    pi.disconnected()
    elapsed = time.time() - start
    logging.info(
        "Replayed %d frames in %.1fs (%.1f fps)", n, elapsed, n / max(elapsed, 1e-9)
    )
    return 0


def replay_ir_file(args, config, thermal_config):
    """IR video replay: decode an mp4/avi (or frame directory) and drive the
    same PiClassifier loop at the IR fps budget (reference ir_camera's
    processing path, piclassify.py:455-540, minus the live capture)."""
    from classifier_pipeline_tpu.pipeline.cameras import HeaderInfo
    from classifier_pipeline_tpu.pipeline.ir_extractor import IR_FPS, load_video
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier
    from classifier_pipeline_tpu.pipeline.recorders import DummyRecorder

    frames = load_video(args.file)
    T, res_y, res_x = frames.shape
    headers = HeaderInfo(
        res_x=res_x, res_y=res_y, fps=IR_FPS, brand=None, model="IR",
        frame_size=res_x * res_y, pixel_bits=8, serial="", firmware="",
    )
    recorder = DummyRecorder(thermal_config, headers)
    pi = PiClassifier(
        config, thermal_config, headers,
        classify=thermal_config.motion.run_classifier and args.classify,
        recorder=recorder, seed=args.seed,
    )
    target_dt = 1.0 / args.fps if args.fps else 0
    start = time.time()
    for pix in frames:
        t0 = time.time()
        pi.process_frame(_IRFrame(pix), time.time())
        if target_dt:
            leftover = target_dt - (time.time() - t0)
            if leftover > 0:
                time.sleep(leftover)
    pi.disconnected()
    elapsed = time.time() - start
    logging.info("Replayed %d IR frames in %.1fs (%.1f fps)", T, elapsed,
                 T / max(elapsed, 1e-9))
    return 0


class _IRFrame:
    """Camera-frame shim for IR pixels (no telemetry)."""

    __slots__ = ("pix", "time_on", "last_ffc_time", "temp_c",
                 "last_ffc_temp_c")

    def __init__(self, pix):
        self.pix = pix
        self.time_on = None
        self.last_ffc_time = None
        self.temp_c = 0.0
        self.last_ffc_temp_c = 0.0


def ir_camera(args, config, thermal_config):
    """Live IR capture loop (reference piclassify.py:455-540): cv2 video
    capture at 10 fps feeding the classifier via a queue, with adaptive
    frame dropping when the consumer falls behind (drop every 9th, tighten
    by one each time the queue stays above 4 s of frames; reset below 3 s)."""
    import cv2  # optional IR video decode — the one allowed cv2 use

    from classifier_pipeline_tpu.pipeline.cameras import HeaderInfo
    from classifier_pipeline_tpu.pipeline.ir_extractor import IR_FPS
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier
    from classifier_pipeline_tpu.services.eventreporter import log_event

    cap = cv2.VideoCapture(args.ir_camera)
    cap.set(cv2.CAP_PROP_FPS, IR_FPS)
    res_x = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    res_y = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    headers = HeaderInfo(
        res_x=res_x, res_y=res_y, fps=IR_FPS, brand=None, model="IR",
        frame_size=res_x * res_y, pixel_bits=8, serial="", firmware="",
    )
    logging.info("IR camera connected %dx%d", res_x, res_y)

    process_queue: queue.Queue = queue.Queue()

    def classifier_loop():
        pi = PiClassifier(
            config, thermal_config, headers,
            classify=thermal_config.motion.run_classifier,
            seed=args.seed,
        )
        while True:
            item = process_queue.get()
            if item is None:
                break
            frame, received = item
            try:
                pi.process_frame(frame, received)
            except Exception:
                logging.exception("IR classifier crashed; restarting")
                log_event("Classify Error", "classifier restarted")
                pi = PiClassifier(
                    config, thermal_config, headers,
                    classify=thermal_config.motion.run_classifier,
                    seed=args.seed,
                )
        pi.disconnected()

    worker = threading.Thread(target=classifier_loop, daemon=True)
    worker.start()
    frames = 0
    drop_every = None
    drop_start = 0
    try:
        while True:
            ok, pix = cap.read()
            if not ok:
                logging.info("no frame from IR capture")
                break
            frames += 1
            if frames == 1:
                log_event("camera-connected", {"type": "IR"})
            if drop_every is not None and (frames - drop_start) % drop_every == 0:
                logging.debug("dropping IR frame (slow processing)")
            else:
                process_queue.put((_IRFrame(pix), time.time()))
            qsize = process_queue.qsize()
            if qsize > headers.fps * 4 and (
                drop_every is None or frames > drop_start + drop_every
            ):
                drop_every = DROP_EVERY if drop_every is None else max(
                    1, drop_every - 1)
                drop_start = frames + 1
                logging.info("dropping every %s frame, qsize %s",
                             drop_every, qsize)
            elif qsize < headers.fps * 3:
                drop_every = None
    finally:
        cap.release()
        process_queue.put(None)
        worker.join(timeout=30)
    return frames


def handle_connection(conn, config, thermal_config, args):
    from classifier_pipeline_tpu.pipeline.cameras import (
        HeaderInfo,
        camera_for_headers,
    )
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier

    conn.settimeout(180)
    # YAML header handshake terminated by "\n\n"; bytes past the terminator
    # are the start of the frame stream and MUST be kept (TCP coalescing —
    # reference handle_headers piclassify.py:435-452 returns left_over)
    data = b""
    while True:
        chunk = conn.recv(4096)
        if not chunk:
            raise ConnectionError("no header received")
        data += chunk
        done = data.find(b"\n\n")
        if done > -1:
            left_over = data[done + 2 :]
            data = data[:done]
            if left_over[:5] == b"clear":
                left_over = left_over[5:]
            break
        if len(data) > 10000:
            raise ConnectionError("oversized header")
    headers = HeaderInfo.parse_header(data.decode())
    logging.info("Camera connected: %s", headers)
    camera = camera_for_headers(headers)

    pi = PiClassifier(
        config, thermal_config, headers,
        classify=thermal_config.motion.run_classifier,
        seed=args.seed,
    )
    frame_size = headers.frame_size + camera.get_telemetry_size() \
        if not headers.frame_size else headers.frame_size
    process_queue: queue.Queue = queue.Queue()
    dead = threading.Event()  # set when the classifier cannot be rebuilt

    def classifier_loop():
        # crash-resilient: the reference's camera reader restarts a dead
        # classifier process (piclassify.py:502-507, 690-696); here the
        # classifier is a thread, so a crashed frame loop rebuilds the
        # PiClassifier in place and keeps consuming
        nonlocal pi
        while True:
            item = process_queue.get()
            if item is None:
                break
            if dead.is_set():
                continue  # drain without processing; producer will stop
            frame, received = item
            try:
                pi.process_frame(frame, received)
            except Exception:
                logging.exception("classifier crashed; restarting pipeline")
                from classifier_pipeline_tpu.services.eventreporter import (
                    log_event,
                )

                log_event("Classify Error", "classifier restarted")
                try:
                    pi = PiClassifier(
                        config, thermal_config, headers,
                        classify=thermal_config.motion.run_classifier,
                        seed=args.seed,
                    )
                except Exception:
                    logging.exception("classifier restart failed")
                    dead.set()  # producer exits; keep draining the queue

    worker = threading.Thread(target=classifier_loop, daemon=True)
    worker.start()
    max_queue = MAX_QUEUE_SECONDS * headers.fps
    dropped = 0
    try:
        while True:
            if dead.is_set():
                raise ConnectionError("classifier unrecoverable")
            buf = left_over  # handshake leftovers prefix the first frame
            left_over = b""
            while len(buf) < frame_size:
                chunk = conn.recv(frame_size - len(buf), socket.MSG_WAITALL)
                if not chunk:
                    raise ConnectionError("camera disconnected")
                buf += chunk
            if buf[:5] == b"clear":
                # camera-side processing error signal (reference
                # piclassify.py:708-714)
                logging.info("processing error from camera")
                break
            frame = camera.parse(buf)
            if frame.pix.min() == 0:
                from classifier_pipeline_tpu.services.eventreporter import log_event

                log_event("bad-thermal-frame")
                continue
            if process_queue.qsize() > max_queue:
                dropped += 1
                if dropped % DROP_EVERY != 0:
                    continue  # drop frame (reference backpressure policy)
            process_queue.put((frame, time.time()))
    finally:
        process_queue.put(None)
        worker.join(timeout=30)
        try:
            pi.disconnected()
        except Exception:
            # don't mask the original error with a teardown failure on an
            # already-broken pipeline
            logging.exception("disconnect cleanup failed")


def main(argv=None):
    parser = argparse.ArgumentParser(description="real-time thermal classifier")
    parser.add_argument("--file", help="replay a CPTV file instead of the camera")
    parser.add_argument("-c", "--config-file")
    parser.add_argument("--thermal-config-file")
    parser.add_argument("--fps", type=int, default=0, help="replay pacing (0 = flat out)")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--detect-after", type=int, default=None)
    parser.add_argument("--no-classify", dest="classify", action="store_false")
    parser.add_argument("--socket", default=SOCKET_NAME)
    parser.add_argument("--ir", action="store_true",
                        help="IR camera mode (cv2 capture loop)")
    parser.add_argument("--ir-camera", type=int, default=0,
                        help="cv2 VideoCapture index for --ir")
    parser.add_argument("--platform", choices=["tpu", "cpu", "default"], default="default")
    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.config.thermalconfig import ThermalConfig
    from classifier_pipeline_tpu.utils.logs import init_logging
    from classifier_pipeline_tpu.utils.tools import enable_compile_cache

    init_logging()

    enable_compile_cache()
    config = Config.load_from_file(args.config_file)
    thermal_config = ThermalConfig.load_from_file(args.thermal_config_file)

    if args.file:
        if Path(args.file).suffix.lower() in (".mp4", ".avi") or Path(
                args.file).is_dir():
            return replay_ir_file(args, config, thermal_config)
        return replay_file(args, config, thermal_config)

    if args.ir:
        return ir_camera(args, config, thermal_config)

    # config-change watcher: exit so the service manager restarts us with
    # the new config (reference monitorconfig.py:7 + piclassify.py:193-199)
    from classifier_pipeline_tpu.services.devices import ConfigMonitor

    watched = [p for p in (args.config_file, args.thermal_config_file) if p]

    def _on_config_change():
        logging.info("config changed; exiting for service-manager restart")
        os._exit(3)

    monitors = [ConfigMonitor(p, _on_config_change) for p in watched]
    for m in monitors:
        m.start()

    sock_path = Path(args.socket)
    if sock_path.exists():
        sock_path.unlink()
    server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    server.bind(str(sock_path))
    server.listen(1)
    logging.info("Listening on %s", sock_path)
    while True:
        conn, _ = server.accept()
        try:
            handle_connection(conn, config, thermal_config, args)
        except Exception:
            logging.exception("connection handler failed")
        finally:
            conn.close()


if __name__ == "__main__":
    sys.exit(main())
