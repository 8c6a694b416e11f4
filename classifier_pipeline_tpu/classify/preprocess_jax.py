"""Device-side classification preprocessing.

Replaces the reference's per-region NumPy/cv2 chain (reference
src/ml_tools/preprocess.py:56-202, src/ml_tools/imageprocessing.py:11-70
resize_and_pad, src/ml_tools/frame.py crop_by_region/resize_with_aspect)
with fixed-shape batched JAX: every region crop+aspect-resize is a vmapped
bilinear gather from the full frame (no dynamic shapes), normalization is a
masked reduction, and the 25-frame 5x5 tiling is a reshape/transpose.

Matches the reference's arithmetic:
  * scale = min(32/h, 32/w); target size = banker's-round, clamped [1, 32].
  * centered placement, except keep_edge pins regions touching the crop
    rectangle to the matching canvas edge (edge_offset 0).
  * thermal canvas pad = min of the crop, filtered pad = 0.
  * thermal: subtract frame median, clip at 0 (unless the track has negative
    medians), then min/max normalize to 0..255 over the 32x32 canvas.
  * filtered: normalize with the track-wide diff limits (diff_norm).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TrackFrames(NamedTuple):
    """Per-track preprocessed frame tiles + norm metadata."""

    tiles: jax.Array  # (F, S, S, 2) f32
    valid: jax.Array  # (F,) bool


def _bilinear_sample(img, ys, xs):
    """Sample img (H, W) at float coords (clamped); 4-tap bilinear.
    Kept as the reference formulation for tests; the hot path uses the
    separable matmul form below."""
    H, W = img.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    fy = jnp.clip(ys - y0.astype(ys.dtype), 0.0, 1.0)
    fx = jnp.clip(xs - x0.astype(xs.dtype), 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _interp_matrix(coords, n):
    """(S,) float sample coords -> (S, n) two-tap interpolation weights.
    Row i holds (1-f) at floor(c_i) and f at floor(c_i)+1 (clamped)."""
    c0 = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n - 1)
    c1 = jnp.clip(c0 + 1, 0, n - 1)
    f = jnp.clip(coords - c0.astype(coords.dtype), 0.0, 1.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], n), 1)
    return (cols == c0[:, None]).astype(jnp.float32) * (1.0 - f)[:, None] + (
        cols == c1[:, None]
    ).astype(jnp.float32) * f[:, None]


def _bilinear_sample_sep(img, sy, sx):
    """Separable bilinear: out = Wy @ img @ Wx^T on the MXU. Arbitrary 2D
    gathers serialize on TPU — they were 87% of the fused classify
    program's device time — while these two small matmuls are negligible.
    Weight rows have at most two nonzeros, so accumulating the zero terms
    is exact; at integer coords (f == 0, e.g. unscaled crops) the result
    is a bit-exact copy, elsewhere it differs from the 4-tap form only in
    association order (last-ulp)."""
    H, W = img.shape
    Wy = _interp_matrix(sy, H)
    Wx = _interp_matrix(sx, W)
    hi = jax.lax.Precision.HIGHEST
    return jax.lax.dot(
        jax.lax.dot(Wy, img, precision=hi), Wx.T, precision=hi
    )


def _round_half_even(x):
    return jnp.round(x)


def resize_region_into_canvas(
    frame,  # (H, W) f32 source
    x0, y0, w, h,  # region (i32 scalars)
    out_size: int,
    crop_rect,  # (cx, cy, cw, ch) static tuple
    pad_value,  # f32 scalar
):
    """reference resize_and_pad with keep_edge=True, edge_offset=(0,0,0,0)."""
    S = out_size
    wf = jnp.maximum(w, 1).astype(jnp.float32)
    hf = jnp.maximum(h, 1).astype(jnp.float32)
    scale = jnp.minimum(S / wf, S / hf)
    tw = jnp.clip(_round_half_even(wf * scale), 1, S).astype(jnp.int32)
    th = jnp.clip(_round_half_even(hf * scale), 1, S).astype(jnp.int32)
    ox = (S - tw) // 2
    oy = (S - th) // 2
    cx, cy, cw, ch = crop_rect
    # keep_edge pinning
    ox = jnp.where(x0 <= cx, jnp.minimum(0, S - tw), ox)
    ox = jnp.where((x0 + w >= cx + cw) & (x0 > cx), jnp.maximum(S - tw, 0), ox)
    oy = jnp.where(y0 <= cy, jnp.minimum(0, S - th), oy)
    oy = jnp.where((y0 + h >= cy + ch) & (y0 > cy), jnp.maximum(S - th, 0), oy)

    jj = jnp.arange(S)
    ii = jnp.arange(S)
    inside_x = (jj >= ox) & (jj < ox + tw)
    inside_y = (ii >= oy) & (ii < oy + th)
    inside = inside_y[:, None] & inside_x[None, :]
    # cv2 INTER_LINEAR coordinates (half-pixel centers), clamped inside crop
    sx = (jj - ox + 0.5).astype(jnp.float32) * (wf / tw.astype(jnp.float32)) - 0.5
    sy = (ii - oy + 0.5).astype(jnp.float32) * (hf / th.astype(jnp.float32)) - 0.5
    sx = jnp.clip(sx, 0.0, wf - 1.0) + x0.astype(jnp.float32)
    sy = jnp.clip(sy, 0.0, hf - 1.0) + y0.astype(jnp.float32)
    sampled = _bilinear_sample_sep(frame, sy, sx)
    return jnp.where(inside, sampled, pad_value)


def _bbox_reduce(img, x0, y0, w, h, init, op):
    H, W = img.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    inb = (xs >= x0) & (xs < x0 + w) & (ys >= y0) & (ys < y0 + h)
    return op(jnp.where(inb, img, init))


@functools.partial(jax.jit, static_argnames=("frame_size", "crop_rect"))
def preprocess_track_frames(
    thermal,  # (T, H, W) f32
    filtered,  # (T, H, W) f32
    regions,  # (F, 5) i32: frame_idx, x, y, w, h
    valid,  # (F,) bool
    medians,  # (T,) f32 per-frame thermal median
    filtered_limits,  # (2,) f32 (min_diff, max_diff) or nan -> plain norm
    frame_size: int = 32,
    crop_rect=(1, 1, 158, 118),
    clip_at_zero=True,  # bool or traced bool
):
    """Produce per-region (frame_size, frame_size, 2) preprocessed tiles."""
    thermal = thermal.astype(jnp.float32)  # accepts raw u16 stacks

    def one(reg, ok):
        fidx, x0, y0, w, h = reg[0], reg[1], reg[2], reg[3], reg[4]
        th_frame = thermal[fidx]
        fi_frame = filtered[fidx]
        pad_t = _bbox_reduce(th_frame, x0, y0, w, h, jnp.float32(3.4e38), jnp.min)
        th_c = resize_region_into_canvas(
            th_frame, x0, y0, w, h, frame_size, crop_rect, pad_t
        )
        fi_c = resize_region_into_canvas(
            fi_frame, x0, y0, w, h, frame_size, crop_rect, jnp.float32(0.0)
        )
        th_c = th_c - medians[fidx]
        th_c = jnp.where(
            jnp.asarray(clip_at_zero), jnp.clip(th_c, 0.0, None), th_c
        )
        # thermal: min/max normalize over canvas
        tmn, tmx = jnp.min(th_c), jnp.max(th_c)
        th_n = jnp.where(
            tmx == tmn,
            jnp.where(tmx == 0, 0.0, th_c / jnp.where(tmx == 0, 1.0, tmx)),
            255.0 * (th_c - tmn) / jnp.where(tmx == tmn, 1.0, tmx - tmn),
        )
        # filtered: diff-norm limits if provided else canvas min/max
        lmn, lmx = filtered_limits[0], filtered_limits[1]
        use_limits = ~jnp.isnan(lmn)
        fmn = jnp.where(use_limits, lmn, jnp.min(fi_c))
        fmx = jnp.where(use_limits, lmx, jnp.max(fi_c))
        fi_n = jnp.where(
            fmx == fmn,
            jnp.where(fmx == 0, 0.0, fi_c / jnp.where(fmx == 0, 1.0, fmx)),
            255.0 * (fi_c - fmn) / jnp.where(fmx == fmn, 1.0, fmx - fmn),
        )
        tile = jnp.stack([th_n, fi_n], axis=-1)
        return jnp.where(ok, tile, 0.0)

    tiles = jax.vmap(one)(regions, valid)
    return TrackFrames(tiles=tiles, valid=valid)


@functools.partial(jax.jit, static_argnames=("square_width",))
def tile_segments(
    frame_tiles,  # (F, S, S, C)
    segment_indices,  # (N, square_width**2) i32 indices into F
    square_width: int = 5,
):
    """reference preprocess_movement/square_clip 5x5 layout: row-major frames."""
    N = segment_indices.shape[0]
    S = frame_tiles.shape[1]
    C = frame_tiles.shape[-1]
    sel = frame_tiles[segment_indices]  # (N, 25, S, S, C)
    sel = sel.reshape(N, square_width, square_width, S, S, C)
    # new_frame[x*S:(x+1)*S, y*S:(y+1)*S] = frames[i], i row-major over (x, y)
    out = sel.transpose(0, 1, 3, 2, 4, 5).reshape(
        N, square_width * S, square_width * S, C
    )
    return out


def filtered_limits_for_track(filtered, regions, valid):
    """reference Interpreter.get_limits diff_norm branch: min/max of filtered
    over every non-blank region crop."""

    def one(reg, ok):
        fidx, x0, y0, w, h = reg[0], reg[1], reg[2], reg[3], reg[4]
        img = filtered[fidx]
        mn = _bbox_reduce(img, x0, y0, w, h, jnp.float32(3.4e38), jnp.min)
        mx = _bbox_reduce(img, x0, y0, w, h, jnp.float32(-3.4e38), jnp.max)
        return jnp.where(ok, mn, 3.4e38), jnp.where(ok, mx, -3.4e38)

    mns, mxs = jax.vmap(one)(regions, valid)
    # reference: min over mins; max_diff starts at 0
    return jnp.stack([jnp.min(mns), jnp.maximum(jnp.max(mxs), 0.0)])
