"""Frechet Inception Distance (framework extension; the reference evaluates
Inception Score only — FID is the field-standard companion metric and reuses
the same Flax Inception-v3 backbone's 2048-d pooled activations).

FID = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.models.inception import (
    InceptionV3Backbone,
    resize_bilinear_align_corners,
)


def make_activation_fn(variables, input_size: int = 299) -> Callable:
    """Jitted images-in-[-1,1] -> (B, 2048) pooled Inception activations."""
    backbone = InceptionV3Backbone()

    @jax.jit
    def activations(imgs):
        if imgs.shape[1] != input_size:
            imgs = resize_bilinear_align_corners(imgs, (input_size, input_size))
        _, pooled = backbone.apply(variables, imgs, False)
        return pooled

    return activations


def activation_stats(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    acts = np.asarray(acts, np.float64)
    mu = acts.mean(axis=0)
    cov = np.cov(acts, rowvar=False)
    return mu, np.atleast_2d(cov)


def _sqrtm_psd_product(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """sqrt(C1 C2) via the PSD trick: with S = sqrt(C1),
    sqrt(C1 C2) has the same trace as sqrt(S C2 S), which is symmetric PSD
    and safe to take an eigendecomposition of."""
    w1, v1 = np.linalg.eigh(c1)
    w1 = np.clip(w1, 0.0, None)
    s = (v1 * np.sqrt(w1)) @ v1.T
    m = s @ c2 @ s
    w, v = np.linalg.eigh((m + m.T) / 2.0)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    diff = mu1 - mu2
    covmean = _sqrtm_psd_product(cov1 + eps * np.eye(cov1.shape[0]),
                                 cov2 + eps * np.eye(cov2.shape[0]))
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def fid(
    images1: Iterable[np.ndarray],
    images2: Iterable[np.ndarray],
    activation_fn: Callable,
    batch_size: int = 32,
) -> float:
    """FID between two iterables of (H, W, 3) images in [-1, 1]."""
    from sba_gan_tpu.evaluation.inception_score import batched_apply

    mu1, c1 = activation_stats(batched_apply(images1, activation_fn, batch_size))
    mu2, c2 = activation_stats(batched_apply(images2, activation_fn, batch_size))
    return frechet_distance(mu1, c1, mu2, c2)
