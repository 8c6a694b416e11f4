"""Degenerate inputs through the batch pipeline: a motionless clip must
produce zero tracks, a trackless-thumbnail fallback (reference
best_trackless_thumb, thumbnail.py:13-59), and an empty classify batch."""

import numpy as np
import pytest


def _flat_clip_cptv(tmp_path, n_frames=48):
    """Write a synthetic CPTV of a static scene (mild fixed gradient, no
    motion) via the native encoder."""
    from classifier_pipeline_tpu.cptv.codec import CptvHeader, CptvWriter

    base = (3000 + 40 * np.linspace(0, 1, 160)[None, :] * np.ones((120, 1))).astype(
        np.uint16
    )
    path = tmp_path / "flat.cptv"
    header = CptvHeader(
        timestamp_us=1_700_000_000_000_000, x_resolution=160, y_resolution=120,
        devicename="test", model="lepton3", brand="flir", fps=9,
    )
    w = CptvWriter(path, header)
    for i in range(n_frames):
        w.write_frame(base, time_on_ms=10_000 + i * 111, last_ffc_ms=100)
    w.close()
    return path


def test_motionless_clip_no_tracks(tmp_path):
    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor

    path = _flat_clip_cptv(tmp_path)
    ex = ClipTrackExtractor(config=Config({}).raw)
    res = ex.collect_batch(ex.scan_batch([path]))[0]
    assert res.tracks == []
    # trackless fallback thumbnail region present (best 64x64 window)
    thumb = res.metadata.get("thumbnail_region")
    assert thumb is not None
    assert thumb["width"] == 64 and thumb["height"] == 64


def test_empty_classify_batch(tmp_path, tmp_path_factory):
    from classifier_pipeline_tpu.config.config import Config, ModelConfig
    from classifier_pipeline_tpu.models.artifacts import create_model
    from classifier_pipeline_tpu.pipeline.clipclassifier import ClipClassifier

    path = _flat_clip_cptv(tmp_path)
    prefix = tmp_path_factory.mktemp("model") / "m"
    create_model(prefix, model_name="simple-cnn")
    model = ModelConfig(id=1, name="t", model_file=str(prefix) + ".json")
    cc = ClipClassifier(Config({}), model=model, seed=1)
    metas = cc.process_batch([path], chunks=1)
    assert len(metas) == 1
    assert metas[0]["tracks"] == []
