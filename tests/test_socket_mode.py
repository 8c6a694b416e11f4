"""Socket-mode ingest: header handshake, raw Lepton3 frame parse, queue
backpressure, and the crash-restart supervision of the classifier loop
(reference piclassify.py:435-452 handshake, :455-540 frame loop,
:502-507 restart-on-death)."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from classifier_pipeline_tpu.config.config import Config
from classifier_pipeline_tpu.config.thermalconfig import ThermalConfig
from classifier_pipeline_tpu.cptv import load_cptv

POSSUM = "/root/reference/tests/clips/possum.cptv"

# FrameSize is the WIRE size including the 640-byte telemetry block — that
# is what leptond sends (reference piclassify.py:333-340 recv's exactly
# headers.frame_size)
# NOTE: no trailing newline — the wire terminator is exactly "\n\n"; a
# trailing "\n" would make the split land early and leak bytes into the
# frame stream
HEADER = (
    "ResX: 160\nResY: 120\nFPS: 9\nBrand: flir\nModel: lepton3\n"
    "PixelBits: 16\nFrameSize: 39040\nCameraSerial: 1\nFirmware: 1.0"
)


def _u32_lepton_bytes(v):
    """Inverse of cameras._u32_lepton (word-swapped big-endian)."""
    return bytes(
        [(v >> 8) & 0xFF, v & 0xFF, (v >> 24) & 0xFF, (v >> 16) & 0xFF]
    )


def lepton3_wire_frame(pix, time_on_ms, last_ffc_ms):
    tel = bytearray(640)
    tel[2:6] = _u32_lepton_bytes(time_on_ms)
    # offsets per cameras.Lepton3.parse_telemetry
    struct.pack_into(">HHH", tel, 44, 0, 0, 27315)
    struct.pack_into(">H", tel, 58, 27315)
    tel[60:64] = _u32_lepton_bytes(last_ffc_ms)
    return bytes(tel) + np.asarray(pix, ">u2").tobytes()


@pytest.fixture()
def thermal_config(tmp_path):
    cfg = ThermalConfig.load_from_file("/root/reference/tests/config.toml")
    cfg.recorder.output_dir = str(tmp_path / "cptv")
    return cfg


def test_lepton3_wire_parse():
    from classifier_pipeline_tpu.pipeline.cameras import (
        HeaderInfo,
        camera_for_headers,
    )

    headers = HeaderInfo.parse_header(HEADER)
    cam = camera_for_headers(headers)
    pix = np.arange(160 * 120, dtype=np.uint16).reshape(120, 160) % 4000 + 2000
    wire = lepton3_wire_frame(pix, 123456, 2000)
    frame = cam.parse(wire)
    assert frame.time_on == 123456
    assert frame.last_ffc_time == 2000
    assert np.array_equal(frame.pix, pix)


def test_socket_session_tracks(thermal_config, monkeypatch, tmp_path):
    """Drive handle_connection over a socketpair with real possum frames."""
    from classifier_pipeline_tpu.cli import piclassify as cli
    from classifier_pipeline_tpu.pipeline import recorders

    monkeypatch.setattr(
        recorders, "disk_space_ok", lambda *a, **k: True, raising=False
    )
    clip = load_cptv(POSSUM)
    server, client = socket.socketpair()

    class Args:
        seed = 1
        classify = False

    results = {}

    def serve():
        try:
            cli.handle_connection(
                server, Config({}), thermal_config, Args
            )
        except (ConnectionError, OSError):
            pass
        except Exception as e:  # pragma: no cover
            results["error"] = e
        finally:
            server.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    client.sendall(HEADER.encode() + b"\n\n" + b"clear")
    n = 0
    for f in clip.frames():
        if f.background_frame:
            continue
        pix = np.asarray(f.pix)
        client.sendall(
            lepton3_wire_frame(pix, f.time_on, f.last_ffc_time)
        )
        n += 1
        if n >= 80:
            break
    time.sleep(3)  # let the classifier thread drain
    client.close()
    t.join(timeout=60)
    assert "error" not in results, results.get("error")


def test_classifier_loop_restarts_on_crash(thermal_config, monkeypatch):
    """A crash inside process_frame must rebuild the pipeline, not kill the
    consumer thread."""
    from classifier_pipeline_tpu.cli import piclassify as cli
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier

    calls = {"n": 0, "rebuilt": 0}
    real_init = PiClassifier.__init__

    def counting_init(self, *a, **k):
        calls["rebuilt"] += 1
        real_init(self, *a, **k)

    monkeypatch.setattr(PiClassifier, "__init__", counting_init)
    orig_process = PiClassifier.process_frame

    def flaky(self, frame, received_at=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("boom")
        return orig_process(self, frame, received_at)

    monkeypatch.setattr(PiClassifier, "process_frame", flaky)

    clip = load_cptv(POSSUM)
    server, client = socket.socketpair()

    class Args:
        seed = 1
        classify = False

    t = threading.Thread(
        target=lambda: _swallow(
            lambda: cli.handle_connection(server, Config({}), thermal_config, Args)
        ),
        daemon=True,
    )
    t.start()
    client.sendall(HEADER.encode() + b"\n\n" + b"clear")
    n = 0
    for f in clip.frames():
        if f.background_frame:
            continue
        client.sendall(
            lepton3_wire_frame(np.asarray(f.pix), f.time_on, f.last_ffc_time)
        )
        n += 1
        if n >= 6:
            break
    deadline = time.time() + 120  # first call waits out the jit warmup
    while time.time() < deadline and calls["n"] < 3:
        time.sleep(1)
    client.close()
    t.join(timeout=60)
    assert calls["n"] >= 3  # kept consuming after the crash
    assert calls["rebuilt"] >= 2  # a fresh PiClassifier was constructed


def _swallow(fn):
    try:
        fn()
    except Exception:
        pass
