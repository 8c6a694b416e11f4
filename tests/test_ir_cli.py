"""extract CLI routes IR video files (.avi/.mp4) to the IR tracker
(reference trackextractor.extract_file picks the extractor by extension,
src/track/trackextractor.py:137-158)."""

import json
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")  # test oracle / fixture producer only


@pytest.fixture(scope="module")
def ir_avi(tmp_path_factory):
    d = tmp_path_factory.mktemp("ircli")
    path = d / "clip.avi"
    H, W, T = 480, 640, 40
    rng = np.random.default_rng(0)
    background = rng.integers(40, 60, (H, W)).astype(np.uint8)
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10, (W, H), isColor=False
    )
    for t in range(T):
        frame = background.copy()
        if t >= 5:
            cx, cy = 80 + t * 10, 240
            yy, xx = np.mgrid[0:H, 0:W]
            frame[((yy - cy) ** 2 + (xx - cx) ** 2) < 35**2] = 220
        w.write(frame)
    w.release()
    return path


def test_extract_cli_ir_video(ir_avi, tmp_path):
    from classifier_pipeline_tpu.cli.extract import main

    rc = main([str(ir_avi), "-o", str(tmp_path), "--platform", "cpu"])
    assert rc == 0
    out = tmp_path / "clip.txt"
    assert out.exists()
    meta = json.loads(out.read_text())
    assert meta["camera_model"] == "IR"
    assert len(meta["tracks"]) >= 1
    # the walking blob's track should span most of its visible run
    t0 = meta["tracks"][0]
    assert t0["num_frames"] >= 10
