"""Thumbnail parity: the scan's device-computed component stats (boundary
length + component thermal median) must select the same thumbnail as the
mask-based host computation on the fixture clips."""

import os
from pathlib import Path

import pytest

CLIPS = Path("/root/reference/tests/clips")
PATHS = [CLIPS / "possum.cptv", CLIPS / "hedgehog.cptv"]


def _thumbs(monkeypatch, host):
    from classifier_pipeline_tpu.config.config import Config
    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor

    monkeypatch.setenv("CPTPU_HOST_THUMBS", "1" if host else "0")
    ex = ClipTrackExtractor(config=Config({}).raw)
    res = ex.collect_batch(ex.scan_batch(PATHS))
    out = []
    for r in res:
        for t in r.metadata["tracks"]:
            out.append(t.get("thumbnail"))
    return out


@pytest.mark.slow
def test_device_thumbnails_match_host_masks(monkeypatch):
    dev = _thumbs(monkeypatch, host=False)
    host = _thumbs(monkeypatch, host=True)
    assert len(dev) == len(host) and len(dev) >= 3
    for d, h in zip(dev, host):
        assert d is not None and h is not None
        # same selected region, same raw stats; the score may differ by a
        # few points (per-track normalization maxima include rows where the
        # in-box and own-component stats diverge)
        assert d["region"] == h["region"]
        assert d["contours"] == h["contours"]
        assert d["median_diff"] == h["median_diff"]
        assert abs(d["score"] - h["score"]) <= 10
