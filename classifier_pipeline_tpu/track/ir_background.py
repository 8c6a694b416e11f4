"""Adaptive Gaussian-mixture background subtraction for IR video, in JAX.

Replaces the reference's cv2.createBackgroundSubtractorMOG2 / pybgs SuBSENSE
(reference src/track/cliptracker.py:561-613) with a Stauffer-Grimson K=3
mixture-of-Gaussians model as a pure scan-friendly update: per-pixel
(weight, mean, var) triples, match-by-Mahalanobis, weight decay, and
foreground = pixels not matching any high-weight component.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

K = 3
VAR_INIT = 225.0  # ~15 gray levels std
VAR_MIN = 16.0
MATCH_SIGMA2 = 4.0 * 4.0  # match within 4 sigma (var multiplier)
BACKGROUND_RATIO = 0.9
DEFAULT_HISTORY = 1000


class MogState(NamedTuple):
    weight: jax.Array  # (K, H, W) f32, sorted desc by weight/var fitness
    mean: jax.Array  # (K, H, W) f32
    var: jax.Array  # (K, H, W) f32


def init_state(first_frame: np.ndarray) -> MogState:
    H, W = first_frame.shape
    weight = jnp.zeros((K, H, W), jnp.float32).at[0].set(1.0)
    mean = jnp.zeros((K, H, W), jnp.float32).at[0].set(
        jnp.asarray(first_frame, jnp.float32)
    )
    var = jnp.full((K, H, W), VAR_INIT, jnp.float32)
    return MogState(weight, mean, var)


def update(state: MogState, frame, learning_rate: float | jax.Array):
    """One MOG update. learning_rate semantics follow cv2: -1 -> 1/history,
    0 -> no model update (detection only), 1 -> replace.
    Returns (new_state, fg_mask u8 0/255)."""
    x = frame.astype(jnp.float32)
    lr = jnp.where(
        learning_rate < 0, 1.0 / DEFAULT_HISTORY, learning_rate
    ).astype(jnp.float32)
    w, m, v = state
    d2 = (x[None] - m) ** 2
    matched = d2 < MATCH_SIGMA2 * v  # (K,H,W)
    # first matched component (highest weight wins)
    first_match = matched & (jnp.cumsum(matched, axis=0) == 1)
    any_match = jnp.any(matched, axis=0)

    rho = lr * 10.0  # component adaptation faster than weight decay
    rho = jnp.minimum(rho, 1.0)
    new_m = jnp.where(first_match, m + rho * (x[None] - m), m)
    new_v = jnp.where(
        first_match,
        jnp.clip(v + rho * (d2 - v), VAR_MIN, 4 * VAR_INIT),
        v,
    )
    new_w = jnp.where(first_match, w + lr * (1.0 - w), w * (1.0 - lr))

    # unmatched pixel: replace weakest component
    weakest = jnp.argmin(new_w, axis=0)
    k_idx = jnp.arange(K)[:, None, None]
    is_weakest = k_idx == weakest[None]
    replace = (~any_match)[None] & is_weakest
    new_w = jnp.where(replace, 0.05, new_w)
    new_m = jnp.where(replace, x[None], new_m)
    new_v = jnp.where(replace, VAR_INIT, new_v)
    new_w = new_w / jnp.sum(new_w, axis=0, keepdims=True)

    # background components: sorted by weight, cumulative up to ratio
    order = jnp.argsort(-new_w, axis=0)
    w_sorted = jnp.take_along_axis(new_w, order, axis=0)
    cum = jnp.cumsum(w_sorted, axis=0)
    is_bg_sorted = (cum - w_sorted) < BACKGROUND_RATIO
    # scatter back
    inv = jnp.argsort(order, axis=0)
    is_bg = jnp.take_along_axis(is_bg_sorted, inv, axis=0)
    fg = ~jnp.any(matched & is_bg, axis=0)
    mask = jnp.where(fg, 255, 0).astype(jnp.uint8)
    # when lr==0 keep the old model (detection only)
    frozen = lr == 0.0
    out = MogState(
        jnp.where(frozen, w, new_w),
        jnp.where(frozen, m, new_m),
        jnp.where(frozen, v, new_v),
    )
    return out, mask


def background_image(state: MogState):
    """Mean of the highest-weight component (cv2 getBackgroundImage-ish)."""
    best = jnp.argmax(state.weight, axis=0)
    return jnp.take_along_axis(state.mean, best[None], axis=0)[0]


class IRBackground:
    """Stateful wrapper matching the reference CVBackground surface."""

    TRIGGER_FRAMES = 2

    def __init__(self):
        self.state = None
        self._frames = 0
        self._update = jax.jit(update)
        self.triggered = 0
        self.movement_detected = False
        self._last_mask = None

    def set_background(self, background, frames=1):
        self.state = init_state(np.asarray(background))
        self._frames = frames

    def update_background(self, frame, learning_rate=-1):
        if self.state is None:
            self.state = init_state(np.asarray(frame))
        self.state, mask = self._update(
            self.state, jnp.asarray(np.asarray(frame)), float(learning_rate)
        )
        self._last_mask = mask
        self._frames += 1
        return mask

    def compute_filtered(self, frame=None):
        if frame is not None:
            _, mask = self._update(self.state, jnp.asarray(np.asarray(frame)), 0.0)
            return np.asarray(mask)
        return np.asarray(self._last_mask) if self._last_mask is not None else None

    @property
    def background(self):
        if self.state is None:
            return None
        return np.asarray(background_image(self.state))

    @property
    def frames(self):
        return self._frames

    def detect_motion(self, erode_kernel=15):
        """Erosion-based trigger (reference Background.detect_motion:545-558):
        movement when eroded foreground still has pixels for 2+ frames."""
        fg = self.compute_filtered()
        if fg is None:
            return False
        k = erode_kernel if not self.movement_detected else 10
        from scipy import ndimage

        eroded = ndimage.minimum_filter(fg, size=(k, k))
        if (eroded > 0).any():
            self.triggered = min(self.triggered + 1, 2)
        else:
            self.triggered = max(self.triggered - 1, 0)
        self.movement_detected = self.triggered >= self.TRIGGER_FRAMES
        return self.movement_detected
