"""FID evaluator tests: identity -> 0, analytic gaussian case, pipeline."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.evaluation.fid import (
    activation_stats,
    fid,
    frechet_distance,
    make_activation_fn,
)
from sba_gan_tpu.models.inception import InceptionV3Backbone

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')


def test_identical_stats_zero():
    rng = np.random.default_rng(0)
    acts = rng.standard_normal((200, 8))
    mu, cov = activation_stats(acts)
    # identical stats: zero up to the eps*I regularization bias (~2*d*eps)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-4


def test_mean_shift_analytic():
    """For equal covariances, FID reduces to ||mu1-mu2||^2."""
    rng = np.random.default_rng(1)
    base = rng.standard_normal((5000, 4))
    mu1, c1 = activation_stats(base)
    mu2, c2 = activation_stats(base + np.array([2.0, 0, 0, 0]))
    d = frechet_distance(mu1, c1, mu2, c2)
    np.testing.assert_allclose(d, 4.0, atol=1e-3)


def test_fid_pipeline_smoke():
    backbone = InceptionV3Backbone()
    variables = backbone.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)), False
    )
    act_fn = make_activation_fn(variables, input_size=75)
    rng = np.random.default_rng(2)
    a = [rng.uniform(-1, 1, (75, 75, 3)).astype(np.float32) for _ in range(8)]
    b = [rng.uniform(-1, 1, (75, 75, 3)).astype(np.float32) for _ in range(8)]
    d_ab = fid(a, b, act_fn, batch_size=4)
    d_aa = fid(a, a, act_fn, batch_size=4)
    assert np.isfinite(d_ab)
    assert d_aa < 1e-3
