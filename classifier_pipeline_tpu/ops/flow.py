"""TV-L1 optical flow in pure JAX (XLA, static shapes).

The reference computes optical flow with OpenCV's DualTVL1
(reference src/ml_tools/tools.py:122-133: tau=1/4, scales=3, warps=3,
scaleStep=0.5, useInitialFlow) on masked+normalized thermal frames
(src/ml_tools/frame.py:143-165), feeding the optional flow channel and the
flow debug tiles (src/ml_tools/imageprocessing.py:107-148). Flow is OFF by
default (config use_opt_flow=False, src/config/config.py:93).

This is the classic Zach/Pock primal-dual TV-L1 solver (the same algorithm
OpenCV implements), written as fixed-iteration lax loops so the whole pyramid
jits into one XLA program. We target algorithmic, not bit, parity: flow feeds
previews and an optional, legacy model channel, so the acceptance criterion is
qualitative (warp error reduction / direction agreement), per SURVEY.md §7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gauss3(x):
    """3x3 binomial smoothing with edge-clamp borders (anti-alias for decimate)."""
    k = jnp.array([0.25, 0.5, 0.25], jnp.float32)
    xp = jnp.pad(x, ((1, 1), (0, 0)), mode="edge")
    x = xp[:-2] * k[0] + xp[1:-1] * k[1] + xp[2:] * k[2]
    xp = jnp.pad(x, ((0, 0), (1, 1)), mode="edge")
    return xp[:, :-2] * k[0] + xp[:, 1:-1] * k[1] + xp[:, 2:] * k[2]


def _downscale2(x):
    """Blur + 2x decimate (scaleStep=0.5 pyramid level)."""
    x = _gauss3(x)
    h2, w2 = x.shape[0] // 2, x.shape[1] // 2
    return x[: 2 * h2 : 2, : 2 * w2 : 2]


def _bilinear(img, yy, xx):
    """Bilinear sample img at float coords (clamped to borders)."""
    h, w = img.shape
    yy = jnp.clip(yy, 0.0, h - 1.0)
    xx = jnp.clip(xx, 0.0, w - 1.0)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = yy - y0
    fx = xx - x0
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


def _grad(x):
    """Forward differences with zero at the far border (standard TV grad)."""
    gx = jnp.concatenate([x[:, 1:] - x[:, :-1], jnp.zeros_like(x[:, :1])], axis=1)
    gy = jnp.concatenate([x[1:] - x[:-1], jnp.zeros_like(x[:1])], axis=0)
    return gx, gy


def _div(px, py):
    """Divergence (adjoint of -_grad)."""
    dx = jnp.concatenate([px[:, :1], px[:, 1:] - px[:, :-1]], axis=1)
    dy = jnp.concatenate([py[:1], py[1:] - py[:-1]], axis=0)
    return dx + dy


def _median5(x):
    """5x5 median filter (OpenCV TVL1 median-filters flow each warp)."""
    h, w = x.shape
    xp = jnp.pad(x, 2, mode="edge")
    patches = jnp.stack(
        [xp[dy : dy + h, dx : dx + w] for dy in range(5) for dx in range(5)], axis=-1
    )
    return jnp.sort(patches, axis=-1)[..., 12]


def _centered_grad(img):
    """Centered differences with replicated borders (image gradient for warps)."""
    xp = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    gx = 0.5 * (xp[:, 2:] - xp[:, :-2])
    yp = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    gy = 0.5 * (yp[2:] - yp[:-2])
    return gx, gy


def _tvl1_level(i0, i1, u, v, *, tau, lmbda, theta, warps, iters):
    h, w = i0.shape
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    l_t = lmbda * theta
    taut = tau / theta

    def warp_body(_, state):
        u, v, p11, p12, p21, p22 = state
        # warp I1 (and its gradient) by the current flow
        i1w = _bilinear(i1, ys + v, xs + u)
        i1gx, i1gy = _centered_grad(i1)
        i1wx = _bilinear(i1gx, ys + v, xs + u)
        i1wy = _bilinear(i1gy, ys + v, xs + u)
        grad_sq = i1wx * i1wx + i1wy * i1wy
        # constant part of the residual rho(u) = i1w + (u-u0)*Ix + (v-v0)*Iy - i0
        rho_c = i1w - i1wx * u - i1wy * v - i0
        u0, v0 = u, v

        def inner(_, st):
            u, v, p11, p12, p21, p22 = st
            rho = rho_c + i1wx * u + i1wy * v
            # pointwise thresholding (the L1 data-term prox)
            d1 = jnp.where(
                rho < -l_t * grad_sq,
                l_t * i1wx,
                jnp.where(
                    rho > l_t * grad_sq,
                    -l_t * i1wx,
                    jnp.where(grad_sq > 1e-10, -rho / jnp.maximum(grad_sq, 1e-10) * i1wx, 0.0),
                ),
            )
            d2 = jnp.where(
                rho < -l_t * grad_sq,
                l_t * i1wy,
                jnp.where(
                    rho > l_t * grad_sq,
                    -l_t * i1wy,
                    jnp.where(grad_sq > 1e-10, -rho / jnp.maximum(grad_sq, 1e-10) * i1wy, 0.0),
                ),
            )
            v1 = u + d1
            v2 = v + d2
            # TV prox via dual ascent on p
            u = v1 + theta * _div(p11, p12)
            v = v2 + theta * _div(p21, p22)
            ugx, ugy = _grad(u)
            vgx, vgy = _grad(v)
            ng1 = 1.0 + taut * jnp.sqrt(ugx * ugx + ugy * ugy)
            ng2 = 1.0 + taut * jnp.sqrt(vgx * vgx + vgy * vgy)
            p11 = (p11 + taut * ugx) / ng1
            p12 = (p12 + taut * ugy) / ng1
            p21 = (p21 + taut * vgx) / ng2
            p22 = (p22 + taut * vgy) / ng2
            return (u, v, p11, p12, p21, p22)

        u, v, p11, p12, p21, p22 = jax.lax.fori_loop(
            0, iters, inner, (u, v, p11, p12, p21, p22)
        )
        del u0, v0
        u = _median5(u)
        v = _median5(v)
        return (u, v, p11, p12, p21, p22)

    z = jnp.zeros_like(u)
    u, v, *_ = jax.lax.fori_loop(0, warps, warp_body, (u, v, z, z, z, z))
    return u, v


@functools.partial(
    jax.jit, static_argnames=("nscales", "warps", "iters")
)
def tvl1_flow(
    prev: jax.Array,
    cur: jax.Array,
    *,
    nscales: int = 3,
    warps: int = 3,
    iters: int = 30,
    tau: float = 0.25,
    lmbda: float = 0.15,
    theta: float = 0.3,
) -> jax.Array:
    """TV-L1 flow prev->cur on f32 images in [0,255]. Returns (H,W,2) [u,v].

    Parameters mirror the reference's fast DualTVL1 config
    (reference src/ml_tools/tools.py:122-133).
    """
    i0 = prev.astype(jnp.float32)
    i1 = cur.astype(jnp.float32)
    pyr0, pyr1 = [i0], [i1]
    for _ in range(nscales - 1):
        if min(pyr0[-1].shape) < 16:
            break
        pyr0.append(_downscale2(pyr0[-1]))
        pyr1.append(_downscale2(pyr1[-1]))
    u = jnp.zeros_like(pyr0[-1])
    v = jnp.zeros_like(pyr0[-1])
    for lvl in range(len(pyr0) - 1, -1, -1):
        u, v = _tvl1_level(
            pyr0[lvl], pyr1[lvl], u, v,
            tau=tau, lmbda=lmbda, theta=theta, warps=warps, iters=iters,
        )
        if lvl > 0:
            h, w = pyr0[lvl - 1].shape
            u = 2.0 * jax.image.resize(u, (h, w), "linear")
            v = 2.0 * jax.image.resize(v, (h, w), "linear")
    return jnp.stack([u, v], axis=-1)  # pixel units


def flow_input(thermal: jax.Array, mask: jax.Array) -> jax.Array:
    """Reference Frame.generate_optical_flow input prep
    (src/ml_tools/frame.py:143-158): zero non-mask pixels, normalize 0..255."""
    from classifier_pipeline_tpu.ops.imageops import normalize_minmax

    masked = jnp.where(mask == 0, 0, thermal).astype(jnp.float32)
    normed, *_ = normalize_minmax(masked, 255.0)
    return normed


def flow_magnitude_gray(flow: jax.Array) -> jax.Array:
    """One flow tile of the reference's square_clip_flow
    (src/ml_tools/imageprocessing.py:107-148): cartToPolar -> HSV(ang,255,mag)
    -> BGR -> gray, as pure jnp. Returns f32 (H,W) 0..255 (pre-normalize)."""
    fx, fy = flow[..., 0], flow[..., 1]
    mag = jnp.sqrt(fx * fx + fy * fy)
    ang = jnp.arctan2(fy, fx)  # cv2.cartToPolar returns [0, 2pi)
    ang = jnp.where(ang < 0, ang + 2 * np.pi, ang)
    hue = ang * 180.0 / np.pi / 2.0  # degrees/2, cv2 8-bit hue convention
    mmax = jnp.max(mag)
    val = jnp.where(mmax > 0, mag / jnp.where(mmax > 0, mmax, 1.0) * 255.0, 0.0)
    sat = jnp.full_like(val, 255.0)
    # HSV->BGR (cv2 full-range float convention: H in [0,360) after *2)
    h6 = (hue * 2.0) / 60.0
    i = jnp.floor(h6) % 6
    f = h6 - jnp.floor(h6)
    p = val * (1 - sat / 255.0)
    q = val * (1 - sat / 255.0 * f)
    t = val * (1 - sat / 255.0 * (1 - f))
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [val, q, p, p, t], val)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, val, val, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, val, val], q)
    # BGR2GRAY weights
    return 0.299 * r + 0.587 * g + 0.114 * b
