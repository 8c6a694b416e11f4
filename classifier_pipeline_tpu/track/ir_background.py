"""IR background subtraction: cv2-exact MOG2, scan-friendly, in JAX.

The reference's IR tracker and IR motion detector both build
``cv2.createBackgroundSubtractorMOG2(history=1000, detectShadows=False)``
(reference src/track/cliptracker.py:561-613, src/piclassifier/
irmotiondetector.py:65). The per-pixel model lives in
:mod:`classifier_pipeline_tpu.track.mog2_jax` — a bit-exact JAX port of
OpenCV's Zivkovic update, oracle-tested per-pixel against cv2 itself
(tests/test_ir_mog2_oracle.py). This module adds the two surfaces the
pipeline consumes:

* a functional ``(init_state, update, background_image)`` API whose state
  carries the frame counter, so the whole clip runs as one ``lax.scan``
  with cv2's ``learningRate=-1 -> 1/min(2*nframes, history)`` resolution
  happening inside the scan (pipeline/ir_extractor.py), and
* the stateful :class:`IRBackground` matching the reference's
  ``CVBackground`` surface (set_background/update_background/
  compute_filtered/background) plus the shared erosion trigger
  ``detect_motion`` (reference cliptracker.py:495-558).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from classifier_pipeline_tpu.track import mog2_jax

HISTORY = 1000  # cv2.createBackgroundSubtractorMOG2(history=1000, ...)


class IrBgState(NamedTuple):
    mog: mog2_jax.Mog2State
    nframes: jax.Array  # i32 scalar — drives the learningRate=-1 schedule


def _resolve_alpha(nframes, learning_rate):
    """cv2 MOG2 apply(): explicit non-negative rates are honored only after
    the first frame; otherwise alphaT = 1/min(2*nframes, history)."""
    lr = jnp.asarray(learning_rate, jnp.float32)
    auto = 1.0 / jnp.minimum(2 * nframes, HISTORY).astype(jnp.float32)
    return jnp.where((lr >= 0) & (nframes > 1), lr, auto)


def init_state(first_frame) -> IrBgState:
    """Seed the model the reference way: ``set_background(frame)`` is one
    ``apply(frame, learning_rate=1)`` (reference cliptracker.py:586-593);
    on the model's first-ever frame cv2 resolves that to alphaT=0.5."""
    first = jnp.asarray(np.asarray(first_frame))
    st = mog2_jax.init_state(first.shape)
    n = jnp.int32(1)
    st, _ = mog2_jax.update(st, first, _resolve_alpha(n, 1.0))
    return IrBgState(st, n)


def update(state: IrBgState, frame, learning_rate):
    """One cv2-ordered MOG2 apply(). Returns (new_state, fg mask u8 0/255)."""
    n = state.nframes + 1
    mog, mask = mog2_jax.update(
        state.mog, frame, _resolve_alpha(n, learning_rate)
    )
    return IrBgState(mog, n), mask


def background_image(state: IrBgState):
    """cv2 getBackgroundImage() for the current model."""
    return mog2_jax.background_image(state.mog)


class IRBackground:
    """Stateful wrapper matching the reference CVBackground surface
    (reference cliptracker.py:561-613 — mog2 branch)."""

    TRIGGER_FRAMES = 2

    def __init__(self):
        self.algorithm = mog2_jax.MOG2(history=HISTORY)
        self._frames = 0
        self.triggered = 0
        self.movement_detected = False
        self._last_mask = None

    def set_background(self, background, frames=1):
        # reference: one apply at learning_rate=1 (cliptracker.py:586-593)
        self.update_background(background, learning_rate=1)

    def update_background(self, frame, learning_rate=-1):
        pix = np.asarray(frame)
        self._last_mask = self.algorithm.apply(pix, learning_rate)
        self._frames += 1
        return self._last_mask

    def compute_filtered(self, frame=None):
        # reference CVBackground.compute_filtered returns the mask from the
        # last update (cliptracker.py:611-613)
        if self._last_mask is None:
            return None
        return np.asarray(self._last_mask)

    @property
    def background(self):
        return self.algorithm.get_background_image()

    @property
    def frames(self):
        return self._frames

    def detect_motion(self):
        """Erosion trigger (reference cliptracker.py:545-558): movement when
        the eroded foreground keeps pixels for TRIGGER_FRAMES frames; kernel
        15x15 while idle, 10x10 while recording (cliptracker.py:501-505)."""
        fg = self.compute_filtered()
        if fg is None:
            return False
        k = 10 if self.movement_detected else 15
        from classifier_pipeline_tpu.utils.tools import get_ndimage

        ndimage = get_ndimage()  # cached (per-frame `from scipy import
        # ndimage` costs ~14 ms/call via scipy's lazy-submodule __getattr__)

        # cv2.erode(fg, ones((k,k))) on a 0/255 mask == minimum filter; cv2
        # pads erode with +inf (borders can't create zeros), scipy 'nearest'
        # replication gives the same surviving-pixel set for binary masks
        eroded = ndimage.minimum_filter(fg, size=(k, k), mode="nearest")
        if (eroded > 0).any():
            self.triggered = min(self.triggered + 1, 2)
        else:
            self.triggered = max(self.triggered - 1, 0)
        self.movement_detected = self.triggered >= self.TRIGGER_FRAMES
        return self.movement_detected
