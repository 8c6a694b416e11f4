"""cv2 BackgroundSubtractorMOG2 (Zivkovic), re-implemented for JAX.

The reference's IR tracker builds ``cv2.createBackgroundSubtractorMOG2(
history=1000, detectShadows=False)`` (reference src/track/cliptracker.py:
561-613). This module replicates that exact per-pixel recursive update —
Zivkovic's adaptive-mixture algorithm as OpenCV implements it, including
its sequencing quirks (weight decay applied mode-by-mode with the
complexity-reduction prune, the background test against the running
cumulative weight, in-loop bubble re-sort of the matched mode, the
new-mode renormalization) — as a fixed-K=5 unrolled vector program over
(H, W) planes, suitable for jit on CPU or TPU.

Oracle: tests/test_ir_mog2_oracle.py asserts per-pixel mask equality vs
cv2's own MOG2 over synthetic sequences.

Defaults mirror cv2's: nmixtures 5, backgroundRatio 0.9, varThreshold 16,
varThresholdGen 9, varInit 15, varMin 4, varMax 75, fCT 0.05.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

K = 5  # nmixtures
TB = 0.9  # backgroundRatio
Tb = 16.0  # varThreshold (squared-distance multiple for the FG decision)
Tg = 9.0  # varThresholdGen (match threshold for model ownership)
VAR_INIT = 15.0
VAR_MIN = 4.0
VAR_MAX = 5.0 * VAR_INIT
CT = 0.05  # complexity-reduction prior (fCT)


class Mog2State(NamedTuple):
    weight: jax.Array  # (K, H, W) f32, sorted desc within the first nmodes
    mean: jax.Array  # (K, H, W) f32
    var: jax.Array  # (K, H, W) f32
    nmodes: jax.Array  # (H, W) i32


def init_state(shape) -> Mog2State:
    H, W = shape
    return Mog2State(
        weight=jnp.zeros((K, H, W), jnp.float32),
        mean=jnp.zeros((K, H, W), jnp.float32),
        var=jnp.full((K, H, W), VAR_INIT, jnp.float32),
        nmodes=jnp.zeros((H, W), jnp.int32),
    )


@jax.jit
def update(state: Mog2State, frame, alphaT):
    """One cv2-ordered MOG2 step. ``alphaT`` is the resolved learning rate
    (the cv2 ``-1 -> 1/min(2*nframes, history)`` rule lives in the host
    wrapper, which owns the frame counter).

    Returns (new_state, fg_mask u8 0/255)."""
    x = frame.astype(jnp.float32)
    alphaT = jnp.float32(alphaT)
    alpha1 = 1.0 - alphaT
    prune = -alphaT * CT

    w = [state.weight[k] for k in range(K)]
    m = [state.mean[k] for k in range(K)]
    v = [state.var[k] for k in range(K)]
    nmodes = state.nmodes

    fits = jnp.zeros(x.shape, bool)
    background = jnp.zeros(x.shape, bool)
    total = jnp.zeros(x.shape, jnp.float32)
    pruned = jnp.zeros(x.shape, jnp.int32)

    for k in range(K):
        # cv2's loop bound re-reads nmodes after in-loop prunes, so a prune
        # at mode j skips one tail mode entirely (it stays in its slot,
        # stale, outside the new nmodes range)
        active = k < (nmodes - pruned)
        wk = alpha1 * w[k] + prune
        d = m[k] - x
        dist2 = d * d
        testable = active & ~fits
        # FG/BG decision: cumulative weight of the modes processed so far
        # (their post-update values), against the PRE-update variance
        background = background | (
            testable & (total < TB) & (dist2 < Tb * v[k])
        )
        fit_k = testable & (dist2 < Tg * v[k])
        wk = jnp.where(fit_k, wk + alphaT, wk)
        # k-factor: only consumed under fit_k (wk >= 0.95*alphaT there)
        kfac = alphaT / jnp.where(wk == 0, 1.0, wk)
        m[k] = jnp.where(fit_k, m[k] - kfac * d, m[k])
        v[k] = jnp.where(
            fit_k,
            jnp.clip(v[k] + kfac * (dist2 - v[k]), VAR_MIN, VAR_MAX),
            v[k],
        )
        fits = fits | fit_k
        prune_k = active & (wk < -prune)
        wk = jnp.where(prune_k, 0.0, wk)
        pruned = pruned + prune_k.astype(jnp.int32)
        w[k] = jnp.where(active, wk, w[k])
        total = total + jnp.where(active, wk, 0.0)
        # bubble the matched mode toward slot 0 while its weight >= the one
        # above (modes above already hold their final weights)
        still = fit_k
        for i in range(k, 0, -1):
            do_swap = still & (w[i] >= w[i - 1])
            for arr in (w, m, v):
                hi, lo = arr[i - 1], arr[i]
                arr[i - 1] = jnp.where(do_swap, lo, hi)
                arr[i] = jnp.where(do_swap, hi, lo)
            still = do_swap

    nmodes_after = nmodes - pruned
    inv_total = jnp.where(total > 0, 1.0 / jnp.where(total == 0, 1.0, total), 0.0)
    for k in range(K):
        w[k] = jnp.where(k < nmodes_after, w[k] * inv_total, w[k])

    # no mode fit: spawn one (replace the weakest slot when full)
    need = fits == False  # noqa: E712 — paired with alphaT>0 below
    need = need & (alphaT > 0)
    slot = jnp.where(nmodes_after == K, K - 1, nmodes_after)
    nmodes_new = jnp.where(need, jnp.minimum(nmodes_after + 1, K), nmodes_after)
    single = nmodes_new == 1
    for k in range(K):
        here = need & (slot == k)
        w[k] = jnp.where(here, jnp.where(single, 1.0, alphaT), w[k])
        m[k] = jnp.where(here, x, m[k])
        v[k] = jnp.where(here, VAR_INIT, v[k])
        # cv2 renormalizes every OTHER in-range mode by alpha1
        others = need & ~single & (k < nmodes_new - 1)
        w[k] = jnp.where(others, w[k] * alpha1, w[k])
    # insert-sort the fresh mode upward (compares alphaT vs stored weights)
    pos = slot
    for i in range(K - 1, 0, -1):
        do_swap = need & ~single & (pos == i) & (alphaT >= w[i - 1])
        for arr in (w, m, v):
            hi, lo = arr[i - 1], arr[i]
            arr[i - 1] = jnp.where(do_swap, lo, hi)
            arr[i] = jnp.where(do_swap, hi, lo)
        pos = jnp.where(do_swap, i - 1, pos)

    new_state = Mog2State(
        weight=jnp.stack(w), mean=jnp.stack(m), var=jnp.stack(v),
        nmodes=nmodes_new,
    )
    mask = jnp.where(background, jnp.uint8(0), jnp.uint8(255))
    return new_state, mask


@jax.jit
def background_image(state: Mog2State):
    """cv2 getBackgroundImage: weight-averaged mean over the leading modes
    whose cumulative weight stays within backgroundRatio."""
    w, m, nmodes = state.weight, state.mean, state.nmodes
    k_idx = jnp.arange(K)[:, None, None]
    in_range = k_idx < nmodes[None]
    w_eff = jnp.where(in_range, w, 0.0)
    cum_before = jnp.cumsum(w_eff, axis=0) - w_eff
    include = in_range & (cum_before <= TB)
    w_inc = jnp.where(include, w_eff, 0.0)
    total = jnp.sum(w_inc, axis=0)
    mean_val = jnp.sum(w_inc * m, axis=0)
    out = jnp.where(total > 0, mean_val / jnp.where(total == 0, 1.0, total), 0.0)
    # cv2 saturate_cast<uchar>: round-half-to-even then clamp
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


class MOG2:
    """Host wrapper with cv2 apply() semantics (owns the frame counter and
    the ``learningRate=-1`` resolution rule).

    Uses the native C step (cptv/_native mog2_update_u8 — the same
    per-pixel recursion, scalar) when available and the input is uint8:
    the jitted plane formulation costs ~1.7 s/frame at 640x480 on a weak
    host core vs a few ms for the scalar pass, and the live IR loop calls
    this every frame. Falls back to the jit path otherwise; the batch
    extractor's lax.scan keeps the functional JAX API either way."""

    def __init__(self, history=1000):
        self.history = int(history)
        self.nframes = 0
        self.state = None
        self._np_state = None

    def _try_native(self, frame, alphaT):
        if frame.dtype != np.uint8 or not frame.flags.c_contiguous:
            return None
        from classifier_pipeline_tpu.cptv.codec import mog2_update_u8_host

        if self._np_state is None:
            H, W = frame.shape
            self._np_state = {
                "weight": np.zeros((K, H, W), np.float32),
                "mean": np.zeros((K, H, W), np.float32),
                "var": np.full((K, H, W), VAR_INIT, np.float32),
                "nmodes": np.zeros((H, W), np.int32),
            }
        s = self._np_state
        mask = np.empty(frame.shape, np.uint8)
        ok = mog2_update_u8_host(
            frame, alphaT, s["weight"], s["mean"], s["var"], s["nmodes"], mask
        )
        if not ok:
            self._np_state = None
            return None
        return mask

    def apply(self, frame, learning_rate=-1.0):
        frame = np.asarray(frame)
        self.nframes += 1
        if learning_rate >= 0 and self.nframes > 1:
            alphaT = float(learning_rate)
        else:
            alphaT = 1.0 / min(2 * self.nframes, self.history)
        if self.state is None:
            np_state = self._np_state
            mask = self._try_native(np.ascontiguousarray(frame), alphaT)
            if mask is not None:
                return mask
            if np_state is not None:
                # the native path had accumulated background statistics and
                # a non-u8 frame (or a native failure) forced the JAX path:
                # carry the model over instead of silently restarting it
                import logging

                logging.warning(
                    "MOG2: native path unavailable after %d frames; "
                    "continuing with the JAX model seeded from the "
                    "accumulated native state", self.nframes - 1,
                )
                self._np_state = None
                self.state = Mog2State(
                    weight=jnp.asarray(np_state["weight"]),
                    mean=jnp.asarray(np_state["mean"]),
                    var=jnp.asarray(np_state["var"]),
                    nmodes=jnp.asarray(np_state["nmodes"]),
                )
            else:
                self.state = init_state(frame.shape)
        self.state, mask = update(self.state, jnp.asarray(frame), alphaT)
        return mask

    def get_background_image(self):
        if self._np_state is not None:
            from classifier_pipeline_tpu.cptv.codec import mog2_background_u8_host

            s = self._np_state
            out = np.empty(s["nmodes"].shape, np.uint8)
            if mog2_background_u8_host(s["weight"], s["mean"], s["nmodes"], out):
                return out
        if self.state is None:
            return None
        return np.asarray(background_image(self.state))
