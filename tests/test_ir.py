"""IR pipeline tests on synthetic video (no codec dependency: PNG frame
directory input)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ir_frames(tmp_path_factory):
    """640x480 synthetic IR clip: static noise background + a bright blob
    walking left to right."""
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("irclip")
    H, W, T = 480, 640, 40
    background = rng.integers(40, 60, (H, W)).astype(np.uint8)
    from PIL import Image

    for t in range(T):
        frame = background.copy()
        if t >= 5:
            cx = 80 + t * 10
            cy = 240
            yy, xx = np.mgrid[0:H, 0:W]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 35**2
            frame[blob] = 220
        Image.fromarray(frame).save(d / f"{t:04d}.png")
    return d


def test_mog_background(ir_frames):
    from classifier_pipeline_tpu.pipeline.ir_extractor import load_video
    from classifier_pipeline_tpu.track import ir_background

    frames = load_video(ir_frames)
    bg = ir_background.IRBackground()
    bg.set_background(frames[0])
    for f in frames[:10]:
        mask = np.asarray(bg.update_background(f))
    # blob present at frame 9: the foreground mask must cover it
    blob_mask = frames[9] > 200
    overlap = (mask > 0) & blob_mask
    assert overlap.sum() > 0.5 * blob_mask.sum()
    # background pixels mostly clean
    assert (mask > 0)[~blob_mask].mean() < 0.05


def test_ir_extract_tracks_blob(ir_frames):
    from classifier_pipeline_tpu.pipeline.ir_extractor import IRTrackExtractor

    ex = IRTrackExtractor(scale=0.25, check_trapped=False)
    meta, good, filtered = ex.extract(ir_frames)
    assert meta["camera_model"] == "IR"
    all_tracks = good + filtered
    assert len(all_tracks) >= 1
    # the main track should follow the blob left to right
    main = max(all_tracks, key=lambda t: len(t.bounds))
    assert len(main.bounds) >= 15
    xs = [b.x + b.width / 2 for b in main.bounds if not b.blank]
    assert xs[-1] > xs[0] + 100, "track should move right"


def test_merge_components():
    import jax.numpy as jnp

    from classifier_pipeline_tpu.ops import imageops as ops

    # two nearby fragments + one distant one
    mask = np.zeros((120, 160), np.int32)
    mask[50:60, 30:40] = 255
    mask[50:60, 45:55] = 255  # 5px gap -> merge
    mask[100:112, 120:135] = 255  # far away
    comps = ops.connected_components_stats(jnp.asarray(mask), 8)
    merged = ops.merge_components_ir(comps, max_gap=40.0, min_mass=40.0)
    valid = np.asarray(merged.valid)
    assert valid.sum() == 2
    w = np.asarray(merged.w)[valid]
    assert 25 in w  # merged box spans 30..55
