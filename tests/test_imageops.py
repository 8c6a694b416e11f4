"""Image-op parity tests against OpenCV (cv2 is a test oracle only — the
product compute path is pure JAX)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from classifier_pipeline_tpu.ops import imageops as ops


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_gaussian_blur5_u8_exact(rng):
    for _ in range(3):
        img = rng.integers(0, 256, (120, 160)).astype(np.uint8)
        ref = cv2.GaussianBlur(img, (5, 5), 0)
        mine = np.asarray(ops.gaussian_blur5_u8(jnp.asarray(img, jnp.int32)))
        np.testing.assert_array_equal(mine.astype(np.uint8), ref)


def test_gaussian_blur5_f32(rng):
    img = rng.uniform(0, 300, (60, 80)).astype(np.float32)
    ref = cv2.GaussianBlur(img, (5, 5), 0)
    mine = np.asarray(ops.gaussian_blur5_f32(jnp.asarray(img)))
    np.testing.assert_allclose(mine, ref, atol=1e-3)


def test_threshold_floor(rng):
    img = rng.integers(0, 256, (50, 60)).astype(np.uint8)
    for t in [30.0, 37.6, 254.9]:
        _, ref = cv2.threshold(img, t, 255, cv2.THRESH_BINARY)
        mine = np.asarray(ops.threshold_binary_u8(jnp.asarray(img, jnp.int32), t))
        np.testing.assert_array_equal(mine.astype(np.uint8), ref)


def test_close_tuple_quirk(rng):
    for _ in range(3):
        img = (rng.integers(0, 2, (40, 50)) * 255).astype(np.uint8)
        ref = cv2.morphologyEx(img, cv2.MORPH_CLOSE, (5, 5))
        mine = np.asarray(ops.close_2x1(jnp.asarray(img, jnp.int32)))
        np.testing.assert_array_equal(mine.astype(np.uint8), ref)


def test_connected_components_vs_cv2(rng):
    for trial in range(5):
        img = (rng.random((60, 80)) < 0.25).astype(np.uint8) * 255
        # close it a bit so components are blob-like but keep some noise
        n_ref, _, stats_ref, cent_ref = cv2.connectedComponentsWithStats(img)
        K = 64
        mine = jax.jit(
            lambda m: ops.connected_components_stats(m, K)
        )(jnp.asarray(img, jnp.int32))
        nv = int(np.sum(np.asarray(mine.valid)))
        assert nv == min(n_ref - 1, K)
        if n_ref - 1 > K:
            continue
        ref = stats_ref[1:]
        order = np.arange(n_ref - 1)
        mx = np.asarray(mine.x)[:nv]
        np.testing.assert_array_equal(mx, ref[order, 0])
        np.testing.assert_array_equal(np.asarray(mine.y)[:nv], ref[order, 1])
        np.testing.assert_array_equal(np.asarray(mine.w)[:nv], ref[order, 2])
        np.testing.assert_array_equal(np.asarray(mine.h)[:nv], ref[order, 3])
        np.testing.assert_array_equal(np.asarray(mine.area)[:nv], ref[order, 4])
        np.testing.assert_allclose(np.asarray(mine.cx)[:nv], cent_ref[1:, 0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(mine.cy)[:nv], cent_ref[1:, 1], atol=1e-4)


def test_ccl_snake():
    # pathological snake: long winding single component
    img = np.zeros((30, 30), np.uint8)
    for r in range(0, 30, 2):
        img[r, :] = 255
        if (r // 2) % 2 == 0 and r + 1 < 30:
            img[r + 1, -1] = 255
        elif r + 1 < 30:
            img[r + 1, 0] = 255
    mine = ops.connected_components_stats(jnp.asarray(img, jnp.int32), 8)
    n_ref, _, stats_ref, _ = cv2.connectedComponentsWithStats(img)
    assert int(np.sum(np.asarray(mine.valid))) == n_ref - 1 == 1
    assert int(np.asarray(mine.area)[0]) == stats_ref[1, 4]


def test_nl_means_close_to_cv2(possum_cptv):
    from classifier_pipeline_tpu.cptv import load_cptv

    clip = load_cptv(possum_cptv)
    bg = clip.pixels[0].astype(np.float32)
    worst = 0.0
    for idx in [40, 60, 100]:
        filt = np.clip(clip.pixels[idx].astype(np.float32) - bg, 0, None)
        mn, mx = filt.min(), filt.max()
        u8 = (255 * (filt - mn) / (mx - mn)).astype(np.uint8)
        ref = cv2.fastNlMeansDenoising(u8, None).astype(np.int32)
        mine = np.asarray(ops.nl_means_denoise_u8(jnp.asarray(u8, jnp.int32)))
        # the XLA path implements cv2's fixed-point scheme exactly
        # (imageops.nlm_weight_lut); no float envelope remains
        np.testing.assert_array_equal(mine, ref)
        worst = max(worst, np.abs(mine - ref).max())
    assert worst == 0


def test_detect_objects_pipeline(possum_cptv):
    """Full detect_objects chain vs the cv2 reference chain on real data."""
    from classifier_pipeline_tpu.cptv import load_cptv

    clip = load_cptv(possum_cptv)
    bg = clip.pixels[0].astype(np.float32)
    for idx in [60, 80]:
        filt = np.clip(clip.pixels[idx].astype(np.float32) - bg, 0, None)
        mn, mx = filt.min(), filt.max()
        norm = (255 * (filt - mn) / (mx - mn)).astype(np.float32)
        u8 = norm.astype(np.uint8)
        thresh = 20 / (mx - mn) * 255

        ref_img = cv2.GaussianBlur(u8, (5, 5), 0)
        _, ref_img = cv2.threshold(ref_img, thresh, 255, cv2.THRESH_BINARY)
        ref_img = cv2.morphologyEx(ref_img, cv2.MORPH_CLOSE, (5, 5))
        n_ref, _, stats_ref, _ = cv2.connectedComponentsWithStats(ref_img)

        mask, stats = jax.jit(lambda x, t: ops.detect_objects(x, t, 16))(
            jnp.asarray(u8, jnp.int32), jnp.float32(thresh)
        )
        np.testing.assert_array_equal(
            np.asarray(mask).astype(np.uint8), ref_img
        )
        nv = int(np.sum(np.asarray(stats.valid)))
        assert nv == n_ref - 1
        np.testing.assert_array_equal(np.asarray(stats.area)[:nv], stats_ref[1:, 4])


def test_delta_upload_codec_bit_exact():
    """Compressed thermal upload (native delta_encode_u16 + device decode)
    reconstructs the uint16 batch bit-exactly, including global jumps and
    isolated outliers."""
    import numpy as np
    import jax.numpy as jnp

    from classifier_pipeline_tpu.cptv.codec import delta_encode_u16
    from classifier_pipeline_tpu.track import tracker_jax

    rng = np.random.default_rng(0)
    th = (3000 + rng.normal(0, 5, (3, 40, 24, 32)).cumsum(axis=1))
    th = np.clip(th, 0, 65535).astype(np.uint16)
    th[1, 20:] += 800   # FFC-style global shift
    th[2, 10, 5, 5] += 5000  # isolated outlier
    enc = delta_encode_u16(th)
    assert enc is not None
    dec = np.asarray(
        tracker_jax._decode_delta_u16(*(jnp.asarray(a) for a in enc))
    )
    np.testing.assert_array_equal(dec, th)
    # numpy reference encoder agrees
    enc2 = tracker_jax._encode_delta_u16(th)
    dec2 = np.asarray(
        tracker_jax._decode_delta_u16(*(jnp.asarray(a) for a in enc2))
    )
    np.testing.assert_array_equal(dec2, th)


import pytest


@pytest.mark.parametrize("pack4", [False, True])
def test_fused_delta_upload_bit_exact(pack4):
    """The single-buffer fused upload (one device_put for first/shift/
    exceptions/residuals, split + bitcast on device) reconstructs the batch
    bit-exactly, including ragged lengths and the replica padding tail —
    in both residual layouts: int8 and signed-nibble pack4 (where clamp
    remainders join the exception scatter)."""
    import numpy as np
    import jax.numpy as jnp

    from classifier_pipeline_tpu.pipeline.extractor import ClipTrackExtractor
    from classifier_pipeline_tpu.cptv.codec import delta_encode_u16
    from classifier_pipeline_tpu.track import tracker_jax
    from classifier_pipeline_tpu.track.tracker_jax import TrackingParams

    rng = np.random.default_rng(1)
    H, W = 24, 32
    lens = [40, 33, 7]
    thermals = []
    deltas = []
    for i, t in enumerate(lens):
        # sigma 2: residuals mostly fit a signed nibble, with a thin tail of
        # pack4 clamp exceptions (sigma 5 would blow pack4's 6% exception
        # budget and force the int8 fallback, dodging the pack4 assertions)
        th = 3000 + rng.normal(0, 2, (t, H, W)).cumsum(axis=0)
        th = np.clip(th, 0, 65535).astype(np.uint16)
        if i == 0:
            th[20:] += 700  # global shift
            th[5, 2, 3] += 4000  # u16-level exception composed w/ pack4 clamp
        thermals.append(th)
        first, resid, shift, ei, ev = (None,) * 5
        enc = delta_encode_u16(th[None])
        assert enc is not None
        _, resid, shift, ei, ev = enc
        deltas.append((np.asarray(resid).reshape(t - 1, H * W),
                       np.asarray(shift).reshape(-1),
                       np.asarray(ei).reshape(-1), np.asarray(ev).reshape(-1)))
    params = TrackingParams(res_x=W, res_y=H)
    ffcs = [np.zeros(t, bool) for t in lens]
    bgs = [th[0] for th in thermals]
    (buf, (B, T, Hh, Ww, K, p4)), _, _ = tracker_jax._pad_clip_batch_delta(
        thermals, ffcs, params, bgs, 8, deltas, pack4=pack4
    )
    assert p4 == pack4  # native pack4 must be available in this env
    dec = np.asarray(tracker_jax._split_delta_fused(
        jnp.asarray(buf), B=B, T=T, H=Hh, W=Ww, K=K, pack4=p4))
    for b, th in enumerate(thermals):
        np.testing.assert_array_equal(dec[b, : len(th)], th)
        # replica padding: every pad frame equals the clip's last frame
        np.testing.assert_array_equal(
            dec[b, len(th):], np.broadcast_to(th[-1], (T - len(th), H, W))
        )


def test_native_nlmeans_vs_cv2_oracle():
    """Native C NL-means (the CPU streaming path) against the cv2 reference:
    BIT-EXACT in every regime. The C kernel replicates cv2's fixed-point
    scheme (19096 fixed-point mult, boxsum>>6 LUT quantization, 0.001
    weight cutoff, integer rounding division — constants re-derived
    empirically against this very oracle), so there is no float envelope
    anymore; low-contrast/sparse frames that used to drift +-1 now match."""
    import numpy as np
    import pytest

    cv2 = pytest.importorskip("cv2")
    from classifier_pipeline_tpu.cptv.codec import nl_means_u8_host

    if nl_means_u8_host(np.zeros((8, 8), np.uint8)) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    cases = []
    # realistic thermal contrast
    for _ in range(3):
        cases.append(
            np.clip(rng.normal(80, 40, (120, 160)), 0, 255).astype(np.uint8)
        )
    # low-contrast degenerate frames (old float kernels drifted here)
    for amp in (1, 2, 4, 16):
        cases.append((120 + rng.integers(0, amp + 1, (120, 160))).astype(np.uint8))
    # sparse low-intensity (the streaming-possum regime that exposed the
    # float drift as +-1 mass diffs) and impulse weight-cutoff probes
    cases.append(rng.integers(0, 30, (120, 160)).astype(np.uint8))
    for a in (40, 56, 63, 255):
        img = np.zeros((60, 60), np.uint8)
        img[30, 30] = a
        cases.append(img)
    for img in cases:
        want = cv2.fastNlMeansDenoising(img, None).astype(np.int32)
        np.testing.assert_array_equal(nl_means_u8_host(img), want)


def test_pallas_packed_nlmeans_interpret_parity():
    """Lane-packed NL-means kernel == unpacked kernel, run in Pallas
    interpret mode so the index math is covered on CPU (the TPU bench is
    otherwise its only exercise)."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from classifier_pipeline_tpu.ops import pallas_nlmeans as pn

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.clip(rng.normal(80, 40, (3, 14, 18)), 0, 255).astype(np.int32)
    )
    # a small search window keeps interpret mode fast while exercising the
    # exact same packing/slice index math
    kw = dict(TEMPLATE=3, SEARCH=5)
    with jax.disable_jit():  # interpret pallas on CPU
        import unittest.mock as mock

        with mock.patch.object(pl, "pallas_call",
                               functools.partial(pl.pallas_call,
                                                 interpret=True)):
            a = np.asarray(pn.nl_means_denoise_u8_pallas(imgs, **kw))
            b = np.asarray(pn.nl_means_denoise_u8_pallas_packed(imgs, **kw))
            c = np.asarray(pn.nl_means_denoise_u8_pallas_sym(imgs, **kw))
            d = np.asarray(pn.nl_means_denoise_u8_pallas_packed_sym(imgs, **kw))
            e = np.asarray(pn.nl_means_denoise_u8_pallas_packed_sym(
                imgs, unroll=True, **kw))
    np.testing.assert_array_equal(a, b)
    # the symmetric-weights kernels compute half the offsets by reusing
    # each weight plane at the mirrored offset; weights are bit-identical
    # (squares are sign-symmetric, box tree order fixed) and on these
    # inputs the whole output matches exactly
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(a, d)
    np.testing.assert_array_equal(a, e)


def test_pallas_nlmeans_tree_unroll_interpret():
    """Cover the PRODUCTION kernel structure (TEMPLATE=7 tree box-sums +
    DY-unrolled row loop) on CPU via interpret mode: every variant equal,
    and BIT-EXACT against cv2.fastNlMeansDenoising at the same window
    params (the kernels implement cv2's fixed-point weight law).
    SEARCH=9 is divisible by _DY_UNROLL so the unrolled indexing runs."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest
    from jax.experimental import pallas as pl

    from classifier_pipeline_tpu.ops import pallas_nlmeans as pn

    cv2 = pytest.importorskip("cv2")
    T, S = 7, 9
    assert S % pn._DY_UNROLL == 0
    rng = np.random.default_rng(1)
    imgs = np.clip(rng.normal(90, 50, (2, 12, 17)), 0, 255).astype(np.int32)

    want = np.stack([
        cv2.fastNlMeansDenoising(i.astype(np.uint8), None, 3.0, T, S)
        for i in imgs
    ]).astype(np.int32)
    kw = dict(TEMPLATE=T, SEARCH=S)
    with jax.disable_jit():
        import unittest.mock as mock

        with mock.patch.object(pl, "pallas_call",
                               functools.partial(pl.pallas_call,
                                                 interpret=True)):
            a = np.asarray(pn.nl_means_denoise_u8_pallas(jnp.asarray(imgs), **kw))
            b = np.asarray(pn.nl_means_denoise_u8_pallas_packed(jnp.asarray(imgs), **kw))
            c = np.asarray(pn.nl_means_denoise_u8_pallas_sym(jnp.asarray(imgs), **kw))
            d = np.asarray(pn.nl_means_denoise_u8_pallas_packed_sym(jnp.asarray(imgs), **kw))
            # fully-unrolled variant over the SAME TEMPLATE=7 tree box-sum
            # path (_kernel_sym_full static-slice -o taps)
            e = np.asarray(pn.nl_means_denoise_u8_pallas_packed_sym(
                jnp.asarray(imgs), unroll=True, **kw))
    np.testing.assert_array_equal(a, b)
    # symmetric-weights kernels (the production TPU path): the v>=1 loop
    # with the one-hot permutation matmul shift runs here (S=9 -> hs=4)
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(a, d)
    np.testing.assert_array_equal(a, e)
    # cv2 bit-exactness at the same (template, search) params
    np.testing.assert_array_equal(a, want)


def test_frame_medians_binary_search_exact():
    """_frame_medians_u16 (16-step value-domain binary search; replaces the
    sort-based jnp.median, which XLA lowers to a ~50ms/chunk full per-frame
    sort on TPU) is exact vs np.median on uint16 frames, including ties,
    extremes, and constant frames."""
    import numpy as np
    import jax.numpy as jnp

    from classifier_pipeline_tpu.track.tracker_jax import _frame_medians_u16

    rng = np.random.default_rng(3)
    for shape in [(2, 3, 120, 160), (1, 1, 4, 4), (3, 2, 5, 7), (1, 2, 1, 3)]:
        x = rng.integers(0, 65536, shape).astype(np.uint16)
        x[..., : min(2, shape[2]), : min(2, shape[3])] = 0
        x[..., -1, -1] = 65535
        got = np.asarray(_frame_medians_u16(jnp.asarray(x)))
        want = np.median(
            x.reshape(shape[0], shape[1], -1).astype(np.float32), axis=-1
        )
        np.testing.assert_array_equal(got, want)
    const = np.full((2, 2, 8, 8), 1234, np.uint16)
    np.testing.assert_array_equal(
        np.asarray(_frame_medians_u16(jnp.asarray(const))),
        np.full((2, 2), 1234.0, np.float32),
    )


def test_component_medians_exact_vs_numpy():
    """Per-component thermal medians (sentinel-packed binary search +
    derived upper order stat) are exact vs np.median over each cv2
    component's pixels on dense random masks. Components are matched by
    (x, y, w, h, area) because cv2's BBDT labeling order differs from
    raster order on noisy masks."""
    import numpy as np
    import pytest

    cv2 = pytest.importorskip("cv2")
    import jax
    import jax.numpy as jnp

    from classifier_pipeline_tpu.ops import imageops as ops

    rng = np.random.default_rng(5)
    checked = 0
    for _ in range(6):
        seeds = (rng.random((40, 50)) < 0.02).astype(np.uint8) * 255
        mask = cv2.dilate(seeds, np.ones((3, 5), np.uint8)).astype(
            np.int32
        )
        img = rng.integers(0, 65536, (40, 50)).astype(np.uint16)
        stats = jax.jit(
            lambda m, a: ops.connected_components_stats(m, 64, aux_img=a)
        )(jnp.asarray(mask), jnp.asarray(img.astype(np.int32)))
        n_ref, labs, st, _ = cv2.connectedComponentsWithStats(
            mask.astype(np.uint8)
        )
        if n_ref - 1 > 64:
            continue
        nv = int(np.sum(np.asarray(stats.valid)))
        got = np.asarray(stats.aux_median)[:nv]
        key2med = {}
        for lbl in range(1, n_ref):
            vals = img[labs == lbl].astype(np.float32)
            key2med[tuple(int(v) for v in st[lbl, :5])] = np.median(vals)
        for i in range(nv):
            k = tuple(
                int(np.asarray(a)[i])
                for a in (stats.x, stats.y, stats.w, stats.h, stats.area)
            )
            assert k in key2med and got[i] == key2med[k]
            checked += 1
    assert checked > 50
