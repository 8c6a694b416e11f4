"""Per-pixel oracle: mog2_jax vs cv2.BackgroundSubtractorMOG2.

The reference builds cv2.createBackgroundSubtractorMOG2(history=1000,
detectShadows=False) for IR tracking and motion detection (reference
src/track/cliptracker.py:561-613, src/piclassifier/irmotiondetector.py:65).
cv2 is an approved TEST ORACLE in this env; these tests assert the JAX
Zivkovic port produces the exact same foreground mask at every frame and
the same background image, over sequences that exercise mode spawning,
pruning, re-sorting, absorption, and regime change.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from classifier_pipeline_tpu.track import ir_background, mog2_jax


def _sequences():
    rng = np.random.default_rng(42)
    H, W = 24, 32
    seqs = {}

    # pure noise around a flat level
    seqs["noise"] = rng.integers(40, 60, (60, H, W)).astype(np.uint8)

    # moving bright blob over noise (mode spawn + absorption)
    frames = rng.integers(40, 60, (60, H, W)).astype(np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(5, 60):
        cx = (2 * t) % W
        blob = ((yy - H // 2) ** 2 + (xx - cx) ** 2) < 6**2
        frames[t][blob] = 220
    seqs["blob"] = frames

    # regime change: light switch at t=30 (every pixel re-models)
    frames = rng.integers(40, 60, (60, H, W)).astype(np.uint8)
    frames[30:] = rng.integers(150, 170, (30, H, W)).astype(np.uint8)
    seqs["switch"] = frames

    # bimodal flicker (two background modes per pixel)
    lo = rng.integers(40, 50, (H, W)).astype(np.uint8)
    hi = rng.integers(90, 100, (H, W)).astype(np.uint8)
    frames = np.stack([lo if t % 3 else hi for t in range(60)])
    seqs["flicker"] = frames

    return seqs


@pytest.mark.parametrize("name", ["noise", "blob", "switch", "flicker"])
def test_mask_equals_cv2_per_pixel(name):
    frames = _sequences()[name]
    ref = cv2.createBackgroundSubtractorMOG2(history=1000, detectShadows=False)
    ours = mog2_jax.MOG2(history=1000)
    for t, f in enumerate(frames):
        want = ref.apply(f, learningRate=-1)
        got = np.asarray(ours.apply(f, learning_rate=-1))
        diff = int((want != got).sum())
        assert diff == 0, f"{name}: frame {t} mask differs at {diff} px"
    want_bg = ref.getBackgroundImage()
    if want_bg.ndim == 3:
        want_bg = want_bg[..., 0]
    got_bg = ours.get_background_image()
    np.testing.assert_array_equal(got_bg, want_bg)


def test_explicit_learning_rates_match_cv2():
    """cv2 honors an explicit non-negative rate only after frame 1; rate 0
    freezes the model, rate 1 replaces it."""
    frames = _sequences()["blob"]
    for lr_seq in ([1.0, -1, -1, 0.0, -1, 0.5] + [-1] * 20,):
        ref = cv2.createBackgroundSubtractorMOG2(history=1000,
                                                 detectShadows=False)
        ours = mog2_jax.MOG2(history=1000)
        for t, lr in enumerate(lr_seq):
            want = ref.apply(frames[t], learningRate=lr)
            got = np.asarray(ours.apply(frames[t], learning_rate=lr))
            assert (want == got).all(), f"lr={lr} frame {t}"


def test_irbackground_class_matches_cv2_usage():
    """IRBackground (reference CVBackground surface, cliptracker.py:561-613):
    set_background == one apply at learningRate=1, then -1 updates."""
    frames = _sequences()["blob"]
    ref = cv2.createBackgroundSubtractorMOG2(history=1000, detectShadows=False)
    ref.apply(frames[0], learningRate=1)
    bg = ir_background.IRBackground()
    bg.set_background(frames[0])
    for f in frames[:20]:
        want = ref.apply(f, learningRate=-1)
        got = np.asarray(bg.update_background(f))
        assert (want == got).all()
    want_bg = ref.getBackgroundImage()
    if want_bg.ndim == 3:
        want_bg = want_bg[..., 0]
    np.testing.assert_array_equal(np.asarray(bg.background), want_bg)


def test_functional_scan_api_matches_class():
    """The scan-friendly (init_state, update) path used by ir_extractor must
    agree with the stateful class (same counter schedule)."""
    import jax.numpy as jnp

    frames = _sequences()["switch"][:25]
    st = ir_background.init_state(frames[0])
    cls = ir_background.IRBackground()
    cls.set_background(frames[0])
    for f in frames:
        st, mask_fn = ir_background.update(st, jnp.asarray(f), -1.0)
        mask_cls = cls.update_background(f)
        assert (np.asarray(mask_fn) == np.asarray(mask_cls)).all()
    np.testing.assert_array_equal(
        np.asarray(ir_background.background_image(st)),
        np.asarray(cls.background),
    )
