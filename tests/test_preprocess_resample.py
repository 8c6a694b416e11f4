"""The separable matmul bilinear resample (classify preprocessing hot path)
vs the 4-tap gather formulation: last-ulp equivalent in general, bit-exact
at integer coordinates (unscaled crops). Arbitrary 2D gathers serialize on
TPU — they were 87% of the fused classify program before this form."""

import numpy as np
import jax
import jax.numpy as jnp

from classifier_pipeline_tpu.classify import preprocess_jax as pp


def test_separable_matches_four_tap():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 4000, (120, 160)).astype(np.float32))
    for _ in range(20):
        sy = jnp.asarray(np.sort(rng.uniform(-0.5, 119.5, 32)).astype(np.float32))
        sx = jnp.asarray(np.sort(rng.uniform(-0.5, 159.5, 32)).astype(np.float32))
        a = np.asarray(
            pp._bilinear_sample(
                img,
                jnp.broadcast_to(sy[:, None], (32, 32)),
                jnp.broadcast_to(sx[None, :], (32, 32)),
            )
        )
        b = np.asarray(pp._bilinear_sample_sep(img, sy, sx))
        assert np.abs(a - b).max() <= 2e-7 * max(np.abs(a).max(), 1.0)


def test_separable_integer_coords_exact():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 4000, (120, 160)).astype(np.float32))
    for _ in range(10):
        y0 = int(rng.integers(0, 88))
        x0 = int(rng.integers(0, 128))
        sy = jnp.asarray(np.arange(32, dtype=np.float32) + y0)
        sx = jnp.asarray(np.arange(32, dtype=np.float32) + x0)
        got = np.asarray(pp._bilinear_sample_sep(img, sy, sx))
        np.testing.assert_array_equal(
            got, np.asarray(img)[y0 : y0 + 32, x0 : x0 + 32]
        )
