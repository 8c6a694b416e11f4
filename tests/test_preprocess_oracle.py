"""Classify-preprocessing chain vs the REFERENCE code as oracle.

Round-3 verdict: the 160x160x2 tensor fed to the CNN was "asserted equal to
the reference's nowhere". These tests run the reference's own
``preprocess_frame`` / ``preprocess_movement`` (reference
src/ml_tools/preprocess.py:56-202, cv2-backed — approved test oracle) over
synthetic frames and assert ``classify/preprocess_jax.py`` produces the
same tiles: crop_by_region, resize_with_aspect (keep_edge pinning, aspect
scaling, pad values), median-subtract + clip-at-zero, diff-norm limits
(``get_limits`` semantics, reference src/ml_tools/interpreter.py:315-363),
min/max normalization, and the 5x5 square_clip tiling.

cv2.resize(INTER_LINEAR) on float32 and our separable-matmul resample agree
to float rounding; everything else is exact, so tolerances are tight
(atol 8e-3 on a 0..255 scale).
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, "/root/reference/src")

# stub third-party modules the reference import chain pulls in but that are
# not installed here (pulled transitively by ml_tools.tools, never used by
# the preprocessing code under test)
if "timezonefinder" not in sys.modules:
    _tzf = types.ModuleType("timezonefinder")
    _tzf.TimezoneFinder = type("TimezoneFinder", (), {})
    sys.modules["timezonefinder"] = _tzf

from classifier_pipeline_tpu.classify import preprocess_jax

CROP = (1, 1, 158, 118)  # the reference's edge-cropped Lepton3 rectangle
H, W = 120, 160
FRAME_SIZE = 32


def _reference_mods():
    pytest.importorskip("cv2")
    from ml_tools import preprocess as ref_preprocess  # noqa: F401
    from ml_tools.frame import Frame
    from ml_tools.rectangle import Rectangle
    from track.region import Region

    return ref_preprocess, Frame, Rectangle, Region


# region boxes chosen to cover: centered, touching each crop edge (keep_edge
# pinning on all four sides), extreme aspect ratios, tiny, near-full-frame
REGIONS = [
    (40, 30, 20, 24),
    (1, 40, 16, 20),        # touches crop left
    (143, 40, 16, 20),      # touches crop right (x + w == 159)
    (60, 1, 20, 12),        # touches crop top
    (60, 107, 20, 12),      # touches crop bottom
    (30, 60, 48, 6),        # wide
    (100, 20, 6, 48),       # tall
    (80, 80, 2, 3),         # tiny (below MIN_SIZE scaling)
    (2, 2, 140, 110),       # near-full-frame (downscale)
    (1, 1, 30, 117),        # corner, pinned both axes
]


def _make_clip(seed=0, T=25):
    rng = np.random.RandomState(seed)
    background = rng.uniform(2400, 3400, (H, W)).astype(np.float32)
    thermal = background[None] + rng.uniform(-20, 60, (T, H, W)).astype(
        np.float32
    )
    filtered = thermal - background[None]
    regions = []
    for i in range(T):
        x, y, w, h = REGIONS[i % len(REGIONS)]
        regions.append((i, x, y, w, h))
    medians = np.array([np.median(t) for t in thermal], np.float32)
    return background, thermal, filtered, np.array(regions, np.int32), medians


def _reference_limits(filtered, regions):
    """get_limits diff_norm branch (interpreter.py:315-363): min over region
    crops of filtered; max starts at 0."""
    min_diff, max_diff = None, 0
    for fi, x, y, w, h in regions:
        crop = filtered[fi][y : y + h, x : x + w]
        if min_diff is None or crop.min() < min_diff:
            min_diff = float(crop.min())
        if crop.max() > max_diff:
            max_diff = float(crop.max())
    return min_diff, max_diff


def _reference_tiles(background, thermal, regions, medians, *,
                     limits, clip_at_zero=True):
    ref_preprocess, Frame, Rectangle, Region = _reference_mods()
    crop_rect = Rectangle(*CROP)
    out = []
    for fi, x, y, w, h in regions:
        frame = Frame(thermal[fi].copy(), None, fi)
        region = Region.from_ltwh(int(x), int(y), int(w), int(h))
        region.frame_number = int(fi)
        pf = ref_preprocess.preprocess_frame(
            frame,
            (FRAME_SIZE, FRAME_SIZE),
            region,
            background=background,
            crop_rectangle=crop_rect,
            calculate_filtered=True,
            filtered_norm_limits=limits,
            median=medians[fi],
            clip_thermals_at_zero=clip_at_zero,
        )
        out.append(pf)
    return out


def _our_tiles(thermal, filtered, regions, medians, *, limits,
               clip_at_zero=True):
    valid = np.ones(len(regions), bool)
    if limits is None:
        lim = jnp.array([np.nan, np.nan], jnp.float32)
    else:
        lim = jnp.array(limits, jnp.float32)
    tf_ = preprocess_jax.preprocess_track_frames(
        jnp.asarray(thermal),
        jnp.asarray(filtered),
        jnp.asarray(regions),
        jnp.asarray(valid),
        jnp.asarray(medians),
        lim,
        frame_size=FRAME_SIZE,
        crop_rect=CROP,
        clip_at_zero=clip_at_zero,
    )
    return np.asarray(tf_.tiles)


@pytest.mark.oracle
def test_limits_match_reference():
    _, thermal, filtered, regions, _ = _make_clip()
    want = _reference_limits(filtered, regions)
    got = np.asarray(
        preprocess_jax.filtered_limits_for_track(
            jnp.asarray(filtered), jnp.asarray(regions),
            jnp.ones(len(regions), bool),
        )
    )
    np.testing.assert_allclose(got, np.array(want, np.float32), rtol=1e-6)


@pytest.mark.oracle
def test_preprocess_frames_match_reference():
    background, thermal, filtered, regions, medians = _make_clip()
    limits = _reference_limits(filtered, regions)
    ref = _reference_tiles(background, thermal, regions, medians,
                           limits=limits)
    ours = _our_tiles(thermal, filtered, regions, medians, limits=limits)
    for i, pf in enumerate(ref):
        np.testing.assert_allclose(
            ours[i, :, :, 0], pf.thermal, atol=8e-3, rtol=0,
            err_msg=f"thermal tile {i} (region {tuple(regions[i])})",
        )
        np.testing.assert_allclose(
            ours[i, :, :, 1], pf.filtered, atol=8e-3, rtol=0,
            err_msg=f"filtered tile {i} (region {tuple(regions[i])})",
        )


@pytest.mark.oracle
def test_preprocess_no_limits_no_clip_matches_reference():
    """filtered_norm_limits=None -> Frame.normalize() per-canvas min/max;
    clip_thermals_at_zero=False keeps negative thermal residuals."""
    background, thermal, filtered, regions, medians = _make_clip(seed=3)
    ref = _reference_tiles(background, thermal, regions, medians,
                           limits=None, clip_at_zero=False)
    ours = _our_tiles(thermal, filtered, regions, medians, limits=None,
                      clip_at_zero=False)
    for i, pf in enumerate(ref):
        np.testing.assert_allclose(
            ours[i, :, :, 0], pf.thermal, atol=8e-3, rtol=0,
            err_msg=f"thermal tile {i}",
        )
        np.testing.assert_allclose(
            ours[i, :, :, 1], pf.filtered, atol=8e-3, rtol=0,
            err_msg=f"filtered tile {i}",
        )


@pytest.mark.oracle
def test_square_tiling_matches_preprocess_movement():
    """The full 160x160x2 CNN input: reference preprocess_movement
    (square_clip row-major 5x5) vs our tile_segments."""
    background, thermal, filtered, regions, medians = _make_clip(seed=5)
    limits = _reference_limits(filtered, regions)
    ref_preprocess, *_ = _reference_mods()
    prep = _reference_tiles(background, thermal, regions, medians,
                            limits=limits)
    want = ref_preprocess.preprocess_movement(
        prep, 5, FRAME_SIZE, ["thermal", "filtered"], preprocess_fn=None
    )
    tiles = _our_tiles(thermal, filtered, regions, medians, limits=limits)
    got = np.asarray(
        preprocess_jax.tile_segments(
            jnp.asarray(tiles), jnp.arange(25, dtype=np.int32)[None], 5
        )[0]
    )
    assert want.shape == got.shape == (160, 160, 2)
    np.testing.assert_allclose(got, want, atol=8e-3, rtol=0)
