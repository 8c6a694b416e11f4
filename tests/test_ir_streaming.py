"""IR streaming runtime: PiClassifier in IR mode (MOG motion detector +
IR scan step + mp4 recorder) over a synthetic moving-blob clip, mirroring
the thermal replay test (reference piclassify.py:455-540 ir_camera +
irrecorder.py)."""

import numpy as np
import pytest

from classifier_pipeline_tpu.config.config import Config
from classifier_pipeline_tpu.config.thermalconfig import ThermalConfig
from classifier_pipeline_tpu.pipeline.cameras import HeaderInfo

RES_X, RES_Y = 160, 120


@pytest.fixture()
def thermal_config(tmp_path):
    cfg = ThermalConfig.load_from_file("/root/reference/tests/config.toml")
    cfg.recorder.output_dir = str(tmp_path / "ir")
    # keep min-recording short so the tiny synthetic clip finalizes
    cfg.recorder.min_secs = 1
    cfg.recorder.preview_secs = 1
    return cfg


def ir_clip(frames=60, seed=0):
    """Static noise background, then a bright blob walking right."""
    rng = np.random.default_rng(seed)
    base = rng.integers(90, 110, size=(RES_Y, RES_X), dtype=np.uint8)
    clip = []
    for t in range(frames):
        f = base.copy()
        if t >= 12:
            cx = 20 + 2 * (t - 12)
            cy = RES_Y // 2
            yy, xx = np.ogrid[:RES_Y, :RES_X]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 12 ** 2
            f[blob] = 230
        clip.append(f)
    return clip


class _Frame:
    def __init__(self, pix):
        self.pix = pix
        self.time_on = None
        self.last_ffc_time = None


def ir_headers():
    return HeaderInfo(
        res_x=RES_X, res_y=RES_Y, fps=10, model="IR", brand=None,
        frame_size=RES_X * RES_Y, pixel_bits=8,
    )


def test_ir_streaming_records_and_tracks(thermal_config, tmp_path):
    from classifier_pipeline_tpu.pipeline.piclassifier import PiClassifier

    headers = ir_headers()
    pi = PiClassifier(Config({}), thermal_config, headers, classify=False)
    assert pi.type == "IR"
    inner = getattr(pi.recorder, "recorder", pi.recorder)  # throttler wraps
    assert inner.__class__.__name__ == "IRRecorder"

    import time as _time

    for pix in ir_clip():
        pi.process_frame(_Frame(pix), _time.time())
    tracks = pi.tracker.all_tracks()
    assert tracks, "moving blob should produce a track"
    xs = [b.x for b in tracks[0].bounds if not b.blank]
    assert xs[-1] > xs[0], "track should follow the blob rightward"
    pi.disconnected()

    out = list(pi.output_dir.rglob("*.mp4")) + list(
        pi.output_dir.rglob("*.gif"))
    assert out, "IR recorder should write an mp4 (or gif fallback)"
    metas = list(pi.output_dir.rglob("*.txt"))
    assert metas, "recording should write a metadata sidecar"
    import json

    meta = json.loads(metas[0].read_text())
    assert meta["tracks"], "metadata should carry the blob track"


def test_ir_replay_cli(thermal_config, tmp_path, monkeypatch):
    """piclassify --file over a directory of IR frames exercises the replay
    entry point (video decode is cv2-optional; PNG directory needs none)."""
    from PIL import Image

    from classifier_pipeline_tpu.cli import piclassify

    d = tmp_path / "irframes"
    d.mkdir()
    for i, pix in enumerate(ir_clip(40)):
        Image.fromarray(pix).save(d / f"{i:04d}.png")

    rc = piclassify.main([
        "--file", str(d),
        "--thermal-config-file", "/root/reference/tests/config.toml",
    ])
    assert rc == 0
