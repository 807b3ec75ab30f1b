"""Legacy WGAN-GP / R1 loss-mode tests (SURVEY.md L5/L9 capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.losses.gan import (
    r1_d_loss,
    wgan_d_loss,
    wgan_g_loss,
    wgan_gradient_penalty,
)


def test_wgan_d_loss_math(rng):
    real = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    loss = wgan_d_loss(real, fake, drift=0.001)
    expect = fake.mean() - real.mean() + 0.001 * jnp.mean(real ** 2)
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-6)
    np.testing.assert_allclose(float(wgan_g_loss(fake)), -float(fake.mean()),
                               rtol=1e-6)


def test_gradient_penalty_linear_critic(rng):
    """For D(x) = sum(w*x), grad wrt x is w everywhere, so the penalty is
    exactly 10*(||w|| - 1)^2 regardless of the interpolation point."""
    w = jnp.asarray(rng.standard_normal((4, 4, 3)).astype(np.float32))

    def d_fn(x):
        return jnp.sum(x * w, axis=(1, 2, 3))

    real = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    gp = wgan_gradient_penalty(d_fn, real, fake, jax.random.PRNGKey(0))
    wnorm = float(jnp.sqrt(jnp.sum(w ** 2)))
    np.testing.assert_allclose(float(gp), 10.0 * (wnorm - 1.0) ** 2, rtol=1e-4)


def test_r1_loss_runs_and_penalizes(rng):
    w = jnp.asarray(rng.standard_normal((4, 4, 3)).astype(np.float32))

    def d_fn(x):
        return jnp.sum(x * w, axis=(1, 2, 3))

    real = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    fake_scores = d_fn(real) * 0.1
    loss = r1_d_loss(d_fn, real, fake_scores, gamma=10.0)
    # penalty term alone: 0.5*gamma*mean(||w||^2)
    assert float(loss) > 0.5 * 10.0 * float(jnp.sum(w ** 2)) - 10.0
    assert np.isfinite(float(loss))
