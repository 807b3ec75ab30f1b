"""Inception-Score evaluator tests (reference inception_score.ipynb parity
of the math, not the pretrained weights)."""

import numpy as np
import jax
import jax.numpy as jnp

from sba_gan_tpu.evaluation.inception_score import (
    InceptionV3Classifier,
    inception_score,
    inception_score_from_probs,
    make_predict_fn,
)


def test_is_math_uniform_vs_peaked():
    # deterministic one-hot predictions spread over classes: IS == n_classes
    n, c = 100, 10
    probs = np.full((n, c), 1e-12)
    probs[np.arange(n), np.arange(n) % c] = 1.0
    mean, std = inception_score_from_probs(probs, splits=10)
    np.testing.assert_allclose(mean, c, rtol=1e-3)
    # identical predictions for every sample: IS == 1
    probs = np.tile(np.eye(c)[0], (n, 1)) + 1e-12
    mean, _ = inception_score_from_probs(probs, splits=10)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-3)


def test_classifier_and_batched_is():
    clf = InceptionV3Classifier(num_classes=7, input_size=75)
    variables = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)), False)
    predict = make_predict_fn(clf, variables)
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(-1, 1, (75, 75, 3)).astype(np.float32) for _ in range(10)]
    mean, std = inception_score(imgs, predict, batch_size=4, splits=2)
    assert np.isfinite(mean) and mean >= 1.0
    probs = np.asarray(predict(np.stack(imgs[:4])))
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
