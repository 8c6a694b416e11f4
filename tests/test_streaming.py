"""Streaming runtime tests (reference tests/test_motion.py + the CI file-
replay harness)."""

import numpy as np
import pytest

from classifier_pipeline_tpu.config.config import Config
from classifier_pipeline_tpu.config.thermalconfig import ThermalConfig
from classifier_pipeline_tpu.cptv import load_cptv
from classifier_pipeline_tpu.pipeline.cameras import CameraFrame, HeaderInfo
from classifier_pipeline_tpu.pipeline.motiondetector import (
    CPTVMotionDetector,
    is_affected_by_ffc,
)


@pytest.fixture()
def thermal_config(tmp_path):
    cfg = ThermalConfig.load_from_file("/root/reference/tests/config.toml")
    cfg.recorder.output_dir = str(tmp_path / "cptv")
    return cfg


def frames_of(clip):
    for f in clip.frames():
        if f.background_frame:
            continue
        yield CameraFrame(
            pix=np.asarray(f.pix),
            time_on=f.time_on,
            last_ffc_time=f.last_ffc_time,
        )


def headers_of(clip):
    h = clip.header
    return HeaderInfo(
        res_x=h.x_resolution, res_y=h.y_resolution, fps=h.fps or 9,
        model=h.model or None, brand=h.brand or None,
        frame_size=h.x_resolution * h.y_resolution * 2, pixel_bits=16,
    )


def test_motion_detected_on_possum(possum_cptv, thermal_config):
    """reference tests/test_motion.py:33-63: the possum clip must trigger."""
    clip = load_cptv(possum_cptv)
    detector = CPTVMotionDetector(
        thermal_config, True, headers_of(clip), detect_after=1
    )
    motion_at = None
    for i, f in enumerate(frames_of(clip)):
        if detector.process_frame(f, force_process=True) and motion_at is None:
            motion_at = i
    assert motion_at is not None, "possum clip should trigger motion"
    # the animal appears around frame 39 in clip numbering
    assert 30 <= motion_at <= 60


def test_ffc_quirk():
    class F:
        time_on = 5132
        last_ffc_time = 0

    # int-milliseconds branch: 5132 ms diff compares against 9 (seconds field)
    assert not is_affected_by_ffc(F())
    F.time_on = 5
    assert is_affected_by_ffc(F())


def test_piclassify_replay(possum_cptv, thermal_config, tmp_path):
    """End-to-end streaming replay without a classifier model."""
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier
    from classifier_pipeline_tpu.pipeline.recorders import DummyRecorder

    clip = load_cptv(possum_cptv)
    headers = headers_of(clip)
    recorder = DummyRecorder(thermal_config, headers)
    pi = PiClassifier(
        Config({}), thermal_config, headers, classify=False, detect_after=1,
        recorder=recorder,
    )
    for f in frames_of(clip):
        pi.process_frame(f)
    # recording must have started and its metadata sidecar must carry at
    # least one surviving track (tracker state is cleared at clip end, so
    # assert on the written artifact; the exact-boxes gate is
    # tests/test_streaming_golden.py)
    assert recorder.frames > 0
    pi.disconnected()
    import json
    from pathlib import Path

    metas = sorted(Path(thermal_config.recorder.output_dir).rglob("*.txt"))
    assert metas, "no recording metadata written"
    tracks = json.loads(metas[0].read_text())["tracks"]
    assert len(tracks) >= 1


def test_streaming_no_midstream_compiles(possum_cptv, thermal_config,
                                         tmp_path_factory):
    """The live loop must never wait on an XLA compile: the ring context
    pads to capacity and the interpreter pads segment tensors to
    streaming_caps, so every classify call after startup_classifier reuses
    the programs compiled at init (a fresh compile is a multi-second stall
    on a Pi-class core). Guarded by the fused jit's cache size staying
    constant across a full replay."""
    from classifier_pipeline_tpu.models.artifacts import create_model
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier
    from classifier_pipeline_tpu.pipeline.recorders import DummyRecorder

    prefix = tmp_path_factory.mktemp("model") / "m"
    create_model(prefix, model_name="simple-cnn")
    config = Config({"classify": {"models": [
        {"id": 1, "name": "t", "model_file": str(prefix) + ".json"}]}})
    clip = load_cptv(possum_cptv)
    headers = headers_of(clip)
    recorder = DummyRecorder(thermal_config, headers)
    pi = PiClassifier(config, thermal_config, headers, classify=True,
                      detect_after=1, recorder=recorder, seed=3)
    assert pi.classifier.streaming_caps is not None
    fused = pi.classifier._fused_classify
    cs0 = fused._cache_size()
    assert cs0 >= 2  # startup warmed both clip_at_zero variants
    for f in frames_of(clip):
        pi.process_frame(f)
    pi.disconnected()
    assert pi.identify_time > 0  # the classify path actually ran
    assert fused._cache_size() == cs0, (
        "a classify shape escaped the streaming caps and recompiled "
        "mid-stream"
    )


def test_throttler_tokens(thermal_config):
    from classifier_pipeline_tpu.pipeline.recorders import (
        DummyRecorder,
        ThrottledRecorder,
    )

    headers = HeaderInfo(res_x=160, res_y=120, fps=9, pixel_bits=16,
                         frame_size=160 * 120 * 2)
    rec = DummyRecorder(thermal_config, headers)
    thr = ThrottledRecorder(rec, thermal_config, headers)
    t = 1000.0
    started = thr.start_recording(None, [], 2900, t)
    assert started
    # drain the bucket
    for i in range(int(thr.bucket_size) + 10):
        thr.process_frame(True, None, t + i / 9)
        if thr.throttling:
            break
    assert thr.throttling
