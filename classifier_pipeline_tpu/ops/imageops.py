"""Core image ops for the tracking hot path, as pure JAX (XLA-fusable).

These replace the OpenCV calls in the reference's per-frame loop
(reference src/ml_tools/imageprocessing.py:240-248, src/track/cliptracker.py:93-122)
with semantics matched bit-for-bit where the reference's behavior is integral
(blur, threshold, morphology, connected components) and numerically matched
where it is not (NL-means denoise).

Conventions worth knowing, all verified against OpenCV:
  * GaussianBlur (5,5) sigma=0 on uint8 uses the fixed [1,4,6,4,1]/16 kernel
    with REFLECT_101 borders and fixed-point rounding ((acc + 128) >> 8).
  * cv2.threshold on uint8 floors a float threshold.
  * The reference passes the *tuple* (5,5) as the morphology kernel
    (src/ml_tools/imageprocessing.py:247): OpenCV interprets that as a 2x1
    column Mat, so the "closing" is a 2-pixel vertical close, not 5x5.
  * connectedComponentsWithStats uses 8-connectivity and assigns labels in
    raster order of each component's first pixel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BLUR_K = np.array([1, 4, 6, 4, 1], np.int32)


def _reflect101_pad(x, pad, axis):
    """REFLECT_101 (cv2 default) padding: gfedcb|abcdefgh|gfedcba."""
    idx_front = [pad - i for i in range(pad)]  # pad..1
    idx_back = [-2 - i for i in range(pad)]  # -2..-(pad+1)
    front = jnp.flip(jnp.take(x, jnp.array(idx_front[::-1]), axis=axis), axis=axis)
    back = jnp.take(x, jnp.array([i % x.shape[axis] for i in idx_back]), axis=axis)
    return jnp.concatenate([front, x, back], axis=axis)


def gaussian_blur5_u8(img: jax.Array) -> jax.Array:
    """cv2.GaussianBlur(u8, (5,5), 0) bit-exact. img int32 0..255 -> int32."""
    x = img.astype(jnp.int32)
    x = _reflect101_pad(x, 2, axis=1)
    h = sum(x[:, i : i + img.shape[1]] * int(_BLUR_K[i]) for i in range(5))
    h = _reflect101_pad(h, 2, axis=0)
    v = sum(h[i : i + img.shape[0], :] * int(_BLUR_K[i]) for i in range(5))
    return (v + 128) >> 8


def gaussian_blur5_f32(img: jax.Array) -> jax.Array:
    """cv2.GaussianBlur(float32, (5,5), 0): float path, no rounding."""
    k = (_BLUR_K / 16.0).astype(np.float32)
    x = img.astype(jnp.float32)
    x = _reflect101_pad(x, 2, axis=1)
    h = sum(x[:, i : i + img.shape[1]] * float(k[i]) for i in range(5))
    h = _reflect101_pad(h, 2, axis=0)
    return sum(h[i : i + img.shape[0], :] * float(k[i]) for i in range(5))


def threshold_binary_u8(img: jax.Array, thresh: jax.Array) -> jax.Array:
    """cv2.threshold(u8, t, 255, THRESH_BINARY): floors float threshold."""
    return jnp.where(img > jnp.floor(thresh), 255, 0).astype(jnp.int32)


def close_2x1(mask: jax.Array) -> jax.Array:
    """cv2.morphologyEx(x, MORPH_CLOSE, (5,5)) — the tuple quirk: 2x1 kernel.

    dilate: out[y] = max(in[y], in[y-1]); erode likewise with min; borders are
    identity (morphology border value is the op's neutral element).
    """
    x = mask
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    d = jnp.maximum(x, up)
    d_up = jnp.concatenate([d[:1], d[:-1]], axis=0)
    return jnp.minimum(d, d_up)


def normalize_minmax(data: jax.Array, new_max: float = 255.0):
    """reference imageprocessing.normalize: scale min..max -> 0..new_max.

    Returns (normed f32, mn, mx, success). Degenerate max==min handled like the
    reference (all-zero if max==0, data/max otherwise).
    """
    mx = jnp.max(data)
    mn = jnp.min(data)
    flat_zero = (mx == mn) & (mx == 0)
    flat = mx == mn
    denom = jnp.where(flat, 1.0, mx - mn)
    normed = new_max * (data.astype(jnp.float32) - mn) / denom
    normed = jnp.where(flat, jnp.where(flat_zero, 0.0, data.astype(jnp.float32) / jnp.where(mx == 0, 1.0, mx)), normed)
    return normed, mn, mx, ~flat_zero


def nlm_weight_lut(
    h: float = 3.0, template: int = 7, search: int = 21
) -> np.ndarray:
    """cv2.fastNlMeansDenoising's fixed-point weight LUT, computed exactly
    as its invoker does (constants re-derived empirically against the cv2
    oracle — see cptv/_native/cptv_codec.cpp nl_means_u8 for the scheme):
    fpm = INT_MAX/(search^2*255); index = boxsum >> 6 (49 -> 64 bin shift);
    w = round(fpm*exp(-idx*(64/49)/h^2)), zeroed under 0.001*fpm. Only the
    first 48 indices are nonzero for h=3 — returned LUT has that length
    (callers treat idx >= len as weight 0)."""
    fpm = (2**31 - 1) // (search * search * 255)
    tpl_sq = template * template
    bin_shift = 0
    while (1 << bin_shift) < tpl_sq:
        bin_shift += 1
    mult = float(1 << bin_shift) / tpl_sq
    n = 1
    while True:
        w = np.rint(fpm * np.exp(-(n * mult) / (h * h)))
        if w < 0.001 * fpm:
            break
        n += 1
    idx = np.arange(n, dtype=np.float64)
    lut = np.rint(fpm * np.exp(-(idx * mult) / (h * h))).astype(np.int32)
    lut[lut < 0.001 * fpm] = 0
    return lut


def nl_means_denoise_u8(
    img: jax.Array, h: float = 3.0, template: int = 7, search: int = 21
) -> jax.Array:
    """cv2.fastNlMeansDenoising(u8, h=3) BIT-EXACT (fixed-point scheme,
    see nlm_weight_lut).

    Classic NL-means: per-pixel weighted average over a (search x search)
    window, integer weight LUT over the (template x template) patch
    distance. Implemented as a batched shift + box-filter; the patch sums
    are exact in f32 (<= 49*255^2 < 2^24), weights/accumulation are exact
    int32 (cv2 sized fixed_point_mult so the num sum fits int32)."""
    H, W = img.shape
    hs, ts = search // 2, template // 2
    p = hs + ts
    x = img.astype(jnp.float32)
    # cv2 pads with BORDER_DEFAULT = REFLECT_101 == numpy 'reflect'
    xpad = jnp.pad(x, p, mode="reflect")
    Hp, Wp = H + 2 * ts, W + 2 * ts
    base = xpad[hs : hs + Hp, hs : hs + Wp]

    lut_np = nlm_weight_lut(h, template, search)
    lut = jnp.asarray(lut_np)

    # All search offsets at once: (S*S, Hp, Wp) shifted views. XLA turns the
    # static strided slices into one big fused elementwise computation — on
    # TPU this is VPU-bound; the box filter is a separable running-sum over
    # the batch.
    shifted = jnp.stack(
        [
            jax.lax.slice(xpad, (dy, dx), (dy + Hp, dx + Wp))
            for dy in range(search)
            for dx in range(search)
        ]
    )
    d2 = (shifted - base[None]) ** 2
    c = jnp.cumsum(d2, axis=1)
    c = jnp.concatenate(
        [c[:, 2 * ts : 2 * ts + 1], c[:, 2 * ts + 1 :] - c[:, : -2 * ts - 1]], axis=1
    )
    c = jnp.cumsum(c, axis=2)
    c = jnp.concatenate(
        [c[:, :, 2 * ts : 2 * ts + 1], c[:, :, 2 * ts + 1 :] - c[:, :, : -2 * ts - 1]],
        axis=2,
    )
    # boxsum exact in f32; quantize to the LUT index (>> 6 == floor/64)
    idx = jnp.floor(c * (1.0 / 64.0)).astype(jnp.int32)
    w = jnp.where(
        idx < lut_np.shape[0], jnp.take(lut, jnp.clip(idx, 0, lut_np.shape[0] - 1)), 0
    )
    centers = shifted[:, ts : ts + H, ts : ts + W].astype(jnp.int32)
    num = jnp.sum(w * centers, axis=0)
    den = jnp.sum(w, axis=0)
    # cv2: (estimation + weights_sum/2) / weights_sum, integer division
    out = (num + den // 2) // den
    return jnp.clip(out, 0, 255).astype(jnp.int32)


class ComponentStats(NamedTuple):
    """cv2.connectedComponentsWithStats equivalent, fixed K slots.

    Slot 0 is implicitly the background (not stored). ``valid`` marks live
    component slots; components appear in raster order of their first pixel
    (cv2's label order). ``overflow`` counts components beyond max_components.
    """

    x: jax.Array  # (K,) i32
    y: jax.Array
    w: jax.Array
    h: jax.Array
    area: jax.Array  # pixel count == region mass
    cx: jax.Array  # (K,) f32 centroid
    cy: jax.Array
    valid: jax.Array  # (K,) bool
    overflow: jax.Array  # scalar i32
    # thumbnail stats (populated by connected_components_stats when asked):
    # external-boundary pixel count, and the integer median of an auxiliary
    # image (thermal) over the component's pixels
    boundary: jax.Array | None = None  # (K,) i32
    aux_median: jax.Array | None = None  # (K,) f32


def _masked_neighbor_min(lab, big):
    """One step of 8-neighbour label-min propagation."""
    p = jnp.pad(lab, 1, constant_values=big)
    m = lab
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.minimum(m, p[1 + dy : 1 + dy + lab.shape[0], 1 + dx : 1 + dx + lab.shape[1]])
    return m


def _segmented_min_scan(values, is_bg, axis, reverse):
    """Min-scan along axis that resets at background pixels (run propagation)."""

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    v, _ = jax.lax.associative_scan(
        combine, (values, is_bg), axis=axis, reverse=reverse
    )
    return v


def _component_medians(eq, area, img_i32, value_bits=16):
    """Exact integer median of img over each component (binary search on
    value: the k-th smallest via count(<=mid) >= k; np.median semantics —
    mean of the two middle values for even counts)."""
    K = eq.shape[0]
    n = area
    k1 = (n - 1) // 2 + 1  # 1-indexed lower-middle order stat
    k2 = n // 2 + 1
    big = jnp.int32((1 << value_bits) - 1)
    # sentinel-packed component image: non-member pixels become the max
    # value, so each search iteration is one compare+reduce instead of
    # compare+mask+reduce. Sentinels can only be counted when mid == max,
    # which the search reaches only after convergence (or for empty
    # components, masked by n > 0 below).
    imgc = jnp.where(eq, img_i32[None], big)

    lo = jnp.zeros((K,), jnp.int32)
    hi = jnp.full((K,), big, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        cnt = jnp.sum(imgc <= mid[:, None, None], axis=(1, 2),
                      dtype=jnp.int32)
        ge = cnt >= k1
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    _, v1 = jax.lax.fori_loop(0, value_bits, body, (lo, hi))
    # upper middle (k2 = k1 or k1+1): v1 again if count(<= v1) >= k2, else
    # the component's smallest value strictly above v1 — two reductions
    # replace a second full binary search (the two searches were ~15% of
    # the whole scan's device time). Sentinels sit at the max value, so
    # they only enter cnt1 when v1 == max (then v2 == v1 either way) and
    # enter the min as `big`, its identity.
    le = imgc <= v1[:, None, None]
    cnt1 = jnp.sum(le, axis=(1, 2), dtype=jnp.int32)
    above_min = jnp.min(jnp.where(le, big, imgc), axis=(1, 2))
    v2 = jnp.where(cnt1 >= k2, v1, above_min)
    return jnp.where(n > 0, (v1 + v2).astype(jnp.float32) / 2.0, 0.0)


def connected_components_stats(
    mask: jax.Array, max_components: int = 16, aux_img: jax.Array | None = None
) -> ComponentStats:
    """8-connected component labeling + per-component stats.

    Labels are seeded with the pixel raster index and iteratively min-reduced:
    one 8-neighbour relaxation step plus four directional run-propagations per
    round, looped to fixed point (exact for any shape). Component order equals
    cv2's (raster order of first pixel, which is exactly the component's
    minimum label).
    """
    H, W = mask.shape
    fg = mask > 0
    BIG = jnp.int32(H * W)

    use_pallas = False
    try:
        use_pallas = jax.devices()[0].platform.lower() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        pass
    if use_pallas:
        # VMEM-resident fixpoint kernel (exact; ~3x the XLA loop)
        from classifier_pipeline_tpu.ops.pallas_ccl import (
            ccl_labels_pallas_single,
        )

        lab = ccl_labels_pallas_single(mask)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W + (
            jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        )
        lab0 = jnp.where(fg, iota, BIG)
        bg = ~fg

        def relax(lab):
            m = jnp.where(fg, _masked_neighbor_min(lab, BIG), BIG)
            m = jnp.minimum(m, lab)
            m = jnp.where(fg, m, BIG)
            m = _segmented_min_scan(m, bg, axis=1, reverse=False)
            m = _segmented_min_scan(m, bg, axis=1, reverse=True)
            m = _segmented_min_scan(m, bg, axis=0, reverse=False)
            m = _segmented_min_scan(m, bg, axis=0, reverse=True)
            return jnp.where(fg, m, BIG)

        def cond(state):
            lab, prev_lab, it = state
            return (it < H * W) & jnp.any(lab != prev_lab)

        def body(state):
            lab, _, it = state
            return relax(lab), lab, it + 1

        lab1 = relax(lab0)
        lab, _, _ = jax.lax.while_loop(cond, body, (lab1, lab0, jnp.int32(0)))

    # Representative labels = min pixel index per component, so label L is
    # present iff the pixel AT flat index L carries label L (the component's
    # min pixel labels itself). An elementwise compare replaces the scatter
    # the TPU would otherwise lower to a full sort (~2ms/step at B=16).
    K = max_components
    flat = lab.reshape(-1)
    present = flat == jnp.arange(H * W, dtype=flat.dtype)
    n_components = jnp.sum(present.astype(jnp.int32))
    overflow = jnp.maximum(n_components - K, 0)
    # first K present label values, ascending
    order_val = jnp.where(present, jnp.arange(H * W, dtype=jnp.int32), BIG)
    sel = jax.lax.top_k(-order_val, K)[0] * -1  # K smallest, ascending
    valid = sel < BIG

    # per-component stats via masked reductions (K x H x W)
    eq = lab[None] == jnp.where(valid, sel, -1)[:, None, None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    big32 = jnp.int32(1 << 30)
    x0 = jnp.min(jnp.where(eq, xs, big32), axis=(1, 2))
    x1 = jnp.max(jnp.where(eq, xs, -1), axis=(1, 2))
    y0 = jnp.min(jnp.where(eq, ys, big32), axis=(1, 2))
    y1 = jnp.max(jnp.where(eq, ys, -1), axis=(1, 2))
    area = jnp.sum(eq, axis=(1, 2), dtype=jnp.int32)
    denom = jnp.maximum(area, 1).astype(jnp.float32)
    cx = jnp.sum(jnp.where(eq, xs, 0), axis=(1, 2)).astype(jnp.float32) / denom
    cy = jnp.sum(jnp.where(eq, ys, 0), axis=(1, 2)).astype(jnp.float32) / denom
    if aux_img is not None:
        # external-boundary pixel count per component: a pixel's 4-neighbour
        # foreground count within its own 8-connected component equals its
        # count within the whole mask (two distinct 8-components are never
        # 4-adjacent), so one boundary mask + per-component sums suffice
        p = jnp.pad(fg, 1)
        nb4 = (
            p[:-2, 1:-1].astype(jnp.int32)
            + p[2:, 1:-1]
            + p[1:-1, :-2]
            + p[1:-1, 2:]
        )
        bnd = fg & (nb4 < 4)
        boundary = jnp.sum(eq & bnd[None], axis=(1, 2), dtype=jnp.int32)
        aux_median = _component_medians(eq, area, aux_img.astype(jnp.int32))
    else:
        boundary = jnp.zeros((K,), jnp.int32)
        aux_median = jnp.zeros((K,), jnp.float32)
    return ComponentStats(
        x=jnp.where(valid, x0, 0),
        y=jnp.where(valid, y0, 0),
        w=jnp.where(valid, x1 - x0 + 1, 0),
        h=jnp.where(valid, y1 - y0 + 1, 0),
        area=jnp.where(valid, area, 0),
        cx=jnp.where(valid, cx, 0.0),
        cy=jnp.where(valid, cy, 0.0),
        valid=valid,
        overflow=overflow,
        boundary=jnp.where(valid, boundary, 0),
        aux_median=jnp.where(valid, aux_median, 0.0),
    )


def detect_objects(
    filtered_u8: jax.Array, threshold: jax.Array, max_components: int = 16,
    aux_img: jax.Array | None = None,
) -> tuple[jax.Array, ComponentStats]:
    """reference detect_objects (src/ml_tools/imageprocessing.py:240): u8 ->
    GaussianBlur(5,5) -> threshold -> close(2x1 tuple-quirk) -> CCL w/ stats.

    Returns (binary mask, ComponentStats). aux_img (e.g. the raw thermal)
    adds per-component medians for thumbnail scoring.
    """
    blurred = gaussian_blur5_u8(filtered_u8)
    th = threshold_binary_u8(blurred, threshold)
    closed = close_2x1(th)
    return closed, connected_components_stats(closed, max_components, aux_img)


def open_2x1(mask: jax.Array) -> jax.Array:
    """cv2.morphologyEx(x, MORPH_OPEN, (15,15)) — same tuple quirk as close:
    the tuple becomes a 2x1 column kernel. open = erode then dilate."""
    x = mask
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    e = jnp.minimum(x, up)
    e_up = jnp.concatenate([e[:1], e[:-1]], axis=0)
    return jnp.maximum(e, e_up)


def detect_objects_ir(
    filtered_u8: jax.Array, threshold: jax.Array, max_components: int = 16,
    aux_img: jax.Array | None = None,
) -> tuple[jax.Array, ComponentStats]:
    """reference detect_objects_ir (imageprocessing.py:185-199): u8 ->
    MORPH_OPEN (tuple-quirk 2x1) -> threshold -> CCL with stats."""
    opened = open_2x1(filtered_u8.astype(jnp.int32))
    th = threshold_binary_u8(opened, threshold)
    return th, connected_components_stats(th, max_components, aux_img)


def merge_components_ir(
    comps: ComponentStats, max_gap: float = 40.0, min_mass: float = 40.0,
    min_size: float = 16.0,
) -> ComponentStats:
    """reference IRTrackExtractor.merge_components (irtrackextractor.py:324-389).

    Drop tiny fragments (mass <= min_mass AND not both sides > min_size),
    sort by mass descending (stable), then each surviving SEED absorbs every
    still-available rect whose ORIGINAL box is adjacent to the seed's
    ORIGINAL box (rect gap distance < max_gap, or overlap on both axes) —
    NOT transitive closure: a chain A-B-C where only consecutive pairs are
    adjacent merges to (A+B) and (C), exactly as the reference's
    delete-and-restart loop does. Reference quirks replicated: rects
    sharing the seed's x0 are skipped (the identity test is r[0]==rect[0],
    irtrackextractor.py:352) and the union bottom uses the UPDATED top with
    the OLD height (:375). Output keeps the reference's mass-descending
    order."""
    K = comps.x.shape[0]
    keep = comps.valid & (
        (comps.area > min_mass)
        | ((comps.w > min_size) & (comps.h > min_size))
    )
    # mass-descending stable sort (python sorted(reverse=True) keeps ties
    # in raster order); invalid slots sink to the end
    order = jnp.argsort(
        jnp.where(keep, -comps.area, jnp.iinfo(jnp.int32).max), stable=True
    )
    sx = comps.x[order].astype(jnp.float32)
    sy = comps.y[order].astype(jnp.float32)
    sw = comps.w[order].astype(jnp.float32)
    sh = comps.h[order].astype(jnp.float32)
    sarea = comps.area[order]
    skeep = keep[order]
    x1 = sx + sw
    y1 = sy + sh
    # adjacency on ORIGINAL boxes: rect gap distance (0 when overlapping
    # per axis, reference rect_distance :789-817) or overlap on both axes
    dx = jnp.maximum(
        jnp.maximum(sx[:, None] - x1[None, :], sx[None, :] - x1[:, None]), 0.0
    )
    dy = jnp.maximum(
        jnp.maximum(sy[:, None] - y1[None, :], sy[None, :] - y1[:, None]), 0.0
    )
    dist = jnp.sqrt(dx * dx + dy * dy)
    overlap_x = (sw[:, None] + sw[None, :]) > (
        jnp.maximum(x1[:, None], x1[None, :]) - jnp.minimum(sx[:, None], sx[None, :])
    )
    overlap_y = (sh[:, None] + sh[None, :]) > (
        jnp.maximum(y1[:, None], y1[None, :]) - jnp.minimum(sy[:, None], sy[None, :])
    )
    samex = sx[:, None] == sx[None, :]
    adj = (
        ((dist < max_gap) | (overlap_x & overlap_y))
        & ~samex
        & skeep[:, None] & skeep[None, :]
    )
    ii = jnp.arange(K)
    # adjacency is symmetric, so an earlier rect adjacent to a later one
    # absorbs it first — seeds only ever absorb later rects
    adj = adj & (ii[None, :] > ii[:, None])

    def seed_body(i, st):
        def absorb(j, st2):
            bx, by, bw, bh, mass, absorbed, owner = st2
            can = (~absorbed[i]) & (~absorbed[j]) & adj[i, j]
            old_x0, old_y0 = bx[i], by[i]
            old_w, old_h = bw[i], bh[i]
            cur_right = old_x0 + old_w
            nx0 = jnp.minimum(old_x0, sx[j])
            ny0 = jnp.minimum(old_y0, sy[j])
            right = jnp.maximum(cur_right, sx[j] + sw[j])
            # reference quirk: bottom from the UPDATED top + OLD height
            bottom = jnp.maximum(ny0 + old_h, sy[j] + sh[j])
            bx = bx.at[i].set(jnp.where(can, nx0, old_x0))
            by = by.at[i].set(jnp.where(can, ny0, old_y0))
            bw = bw.at[i].set(jnp.where(can, right - nx0, old_w))
            bh = bh.at[i].set(jnp.where(can, bottom - ny0, old_h))
            mass = mass.at[i].add(jnp.where(can, sarea[j], 0))
            absorbed = absorbed.at[j].set(absorbed[j] | can)
            owner = owner.at[j].set(jnp.where(can, i, owner[j]))
            return bx, by, bw, bh, mass, absorbed, owner

        return jax.lax.fori_loop(0, K, absorb, st)

    init = (
        sx, sy, sw, sh, sarea,
        jnp.zeros((K,), jnp.bool_), jnp.arange(K),
    )
    bx, by, bw, bh, mass, absorbed, owner = jax.lax.fori_loop(
        0, K, seed_body, init
    )
    is_seed = skeep & ~absorbed
    # group aggregates for the auxiliary stats (members = seed + absorbed)
    eq = owner[None, :] == ii[:, None]
    scx = comps.cx[order]
    scy = comps.cy[order]
    gm = jnp.sum(jnp.where(eq, sarea[None, :], 0), axis=1)
    cxs = jnp.sum(jnp.where(eq, scx[None, :] * sarea[None, :], 0.0), axis=1)
    cys = jnp.sum(jnp.where(eq, scy[None, :] * sarea[None, :], 0.0), axis=1)
    denom = jnp.maximum(gm, 1).astype(jnp.float32)
    # pack seeds to the front preserving the mass-descending order
    pack = jnp.argsort(jnp.where(is_seed, 0, 1), stable=True)
    g = lambda a: a[pack]
    sboundary = None if comps.boundary is None else comps.boundary[order]
    saux = None if comps.aux_median is None else comps.aux_median[order]
    return ComponentStats(
        x=jnp.where(g(is_seed), g(bx).astype(jnp.int32), 0),
        y=jnp.where(g(is_seed), g(by).astype(jnp.int32), 0),
        w=jnp.where(g(is_seed), g(bw).astype(jnp.int32), 0),
        h=jnp.where(g(is_seed), g(bh).astype(jnp.int32), 0),
        area=jnp.where(g(is_seed), g(mass), 0),
        cx=jnp.where(g(is_seed), g(cxs) / g(denom), 0.0),
        cy=jnp.where(g(is_seed), g(cys) / g(denom), 0.0),
        valid=g(is_seed),
        overflow=comps.overflow,
        # merged thumbnail stats: boundaries of group members add; the
        # median approximates as the mass-dominant member's
        boundary=None
        if sboundary is None
        else jnp.where(
            g(is_seed),
            g(jnp.sum(jnp.where(eq, sboundary[None, :], 0), axis=1)),
            0,
        ),
        aux_median=None
        if saux is None
        else jnp.where(
            g(is_seed),
            g(saux[jnp.argmax(jnp.where(eq, sarea[None, :], -1), axis=1)]),
            0.0,
        ),
    )

def calculate_mass(filtered_f32: jax.Array, threshold: jax.Array) -> jax.Array:
    """reference region.calculate_mass: float blur then count(> threshold).

    (reference src/track/region.py:234-255: blur, zero below threshold, count
    positive survivors.)
    """
    th = gaussian_blur5_f32(filtered_f32)
    keep = (th - threshold) >= 0
    return jnp.sum(keep & (th > 0), dtype=jnp.int32)


def _hist60_bbox(img: jax.Array, x, y, w, h) -> jax.Array:
    """cv2.calcHist([img], bins=60, range=[0,255]) over a bbox, then
    cv2.normalize(NORM_MINMAX, 0..1). Uniform bins over [0,255): value v maps
    to floor(v*60/255); v outside [0,255) is dropped (cv2 range semantics)."""
    H, W = img.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inside = (ys >= y) & (ys < y + h) & (xs >= x) & (xs < x + w)
    v = img.astype(jnp.float32)
    idx = jnp.floor(v * (60.0 / 255.0)).astype(jnp.int32)
    ok = inside & (v >= 0) & (idx < 60) & (idx >= 0)
    idx = jnp.where(ok, idx, 60)
    hist = jnp.zeros((61,), jnp.float32).at[idx.reshape(-1)].add(
        ok.reshape(-1).astype(jnp.float32)
    )[:60]
    mn, mx = jnp.min(hist), jnp.max(hist)
    scale = jnp.where(mx - mn > 0, 1.0 / jnp.where(mx - mn > 0, mx - mn, 1.0), 0.0)
    return (hist - mn) * scale


def hist_diff_bbox(
    background: jax.Array, thermal: jax.Array, x, y, w, h
) -> jax.Array:
    """reference imageprocessing.hist_diff (src/ml_tools/imageprocessing.py:264-302):
    60-bin histograms of the region's background/thermal crops, minmax-normalized,
    compared with cv2.compareHist(..., 0) (Pearson correlation).

    Used by the optional min_hist_diff matching gate
    (src/track/cliptracker.py:168-185). Returns the correlation scalar.
    """
    ha = _hist60_bbox(thermal, x, y, w, h)
    hb = _hist60_bbox(background, x, y, w, h)
    am, bm = jnp.mean(ha), jnp.mean(hb)
    da, db = ha - am, hb - bm
    num = jnp.sum(da * db)
    den = jnp.sqrt(jnp.sum(da * da) * jnp.sum(db * db))
    # cv2 returns 1.0 when both histograms are constant (den ~ 0)
    return jnp.where(jnp.abs(den) > 1e-12, num / jnp.where(den > 0, den, 1.0), 1.0)


def inpaint_diffusion(img: jax.Array, mask: jax.Array, iters: int = 64) -> jax.Array:
    """Fill mask>0 pixels by harmonic interpolation from their surroundings.

    TPU-friendly stand-in for cv2.inpaint(..., INPAINT_TELEA, 3) as used by the
    (upstream-disabled) background-animal removal (reference
    src/track/clip.py:296-305): Jacobi iterations of 4-neighbour averaging over
    the masked set, which solves the same Laplace problem Telea's marching
    method approximates for small regions.
    """
    img = img.astype(jnp.float32)
    hole = mask > 0
    # seed holes with the unmasked mean so iteration starts near the answer
    seed = jnp.sum(jnp.where(hole, 0.0, img)) / jnp.maximum(
        jnp.sum(~hole), 1
    )
    x0 = jnp.where(hole, seed, img)

    def body(_, x):
        up = jnp.concatenate([x[:1], x[:-1]], axis=0)
        dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
        lf = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        rt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
        avg = (up + dn + lf + rt) * 0.25
        return jnp.where(hole, avg, x)

    return jax.lax.fori_loop(0, iters, body, x0)


def otsu_threshold_u8(img: jax.Array) -> jax.Array:
    """cv2 THRESH_OTSU threshold on u8 data (first argmax of between-class
    variance over the 256-bin histogram), for detect_objects(otsus=True)
    (reference src/ml_tools/imageprocessing.py:244-246)."""
    flat = img.reshape(-1).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.float32).at[flat].add(1.0)
    n = flat.shape[0]
    p = hist / n
    omega = jnp.cumsum(p)
    mu = jnp.cumsum(p * jnp.arange(256, dtype=jnp.float32))
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma = jnp.where(denom > 1e-12, (mu_t * omega - mu) ** 2 / jnp.where(denom > 0, denom, 1.0), 0.0)
    return jnp.argmax(sigma).astype(jnp.float32)
