"""Legacy StyleGAN component tests (SURVEY.md L1-L5 extras)."""

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.models.legacy_style import (
    Blur4Tap,
    ConstantInput,
    EqualizedConv,
    EqualizedDense,
    NoiseInjection,
    PixelNorm,
    mean_style,
    minibatch_stddev,
    progressive_schedule,
    truncate_w,
)


def test_pixelnorm_unit_rms(rng):
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32)) * 7.0
    y = PixelNorm().apply({}, x)
    rms = np.sqrt(np.mean(np.asarray(y) ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-4)


def test_equalized_dense_scale(rng):
    m = EqualizedDense(8)
    x = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    # output equals x @ (w * he_scale) + b
    w = np.asarray(v["params"]["weight"])
    scale = np.sqrt(2.0) / np.sqrt(32)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ (w * scale), rtol=1e-5, atol=1e-6
    )


def test_equalized_conv_shapes(rng):
    m = EqualizedConv(6, (3, 3))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (2, 8, 8, 6)


def test_blur_preserves_constant():
    x = jnp.ones((1, 8, 8, 3), jnp.float32)
    y = Blur4Tap().apply({}, x)
    # interior pixels of a constant image stay constant under a norm-1 blur
    np.testing.assert_allclose(np.asarray(y)[0, 2:-2, 2:-2], 1.0, rtol=1e-6)


def test_noise_injection_zero_init(rng):
    m = NoiseInjection()
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    y = m.apply(v, x, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))  # gamma=0


def test_constant_input():
    m = ConstantInput(16)
    v = m.init(jax.random.PRNGKey(0), 3)
    y = m.apply(v, 3)
    assert y.shape == (3, 4, 4, 16)
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(y[2]))


def test_minibatch_stddev(rng):
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 8)).astype(np.float32))
    y = minibatch_stddev(x)
    assert y.shape == (4, 4, 4, 9)
    assert np.all(np.asarray(y[..., -1]) == np.asarray(y[0, 0, 0, -1]))


def test_truncation():
    w = jnp.asarray(np.array([[2.0, 4.0], [0.0, 0.0]], np.float32))
    wm = mean_style(w)
    np.testing.assert_allclose(np.asarray(wm), [[1.0, 2.0]])
    t = truncate_w(w, wm, psi=0.5)
    np.testing.assert_allclose(np.asarray(t), [[1.5, 3.0], [0.5, 1.0]])


def test_progressive_schedule():
    # 8 -> 16 -> 32 -> 64 with alpha ramp per phase
    res, alpha = progressive_schedule(0, 1000, 10)
    assert (res, alpha) == (8, 1.0)
    res, alpha = progressive_schedule(100, 1000, 10)  # used=1000 -> phase 1
    assert res == 16 and alpha == 0.0
    res, alpha = progressive_schedule(150, 1000, 10)  # halfway through fade
    assert res == 16 and abs(alpha - 0.5) < 1e-6
    res, alpha = progressive_schedule(10_000, 1000, 10)  # clamped at max
    assert res == 64
