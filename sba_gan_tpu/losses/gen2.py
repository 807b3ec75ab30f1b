"""Gen-2 loss functions (SURVEY.md L9).

Capability parity with ``Old_Code/code/miscc/losses.py``: the simplified
sentence-matching loss, BCE conditional GAN losses with the wrong-pair term,
and the WGAN-GP variants whose gradient penalty runs through the D feature
extractor.

Deviations (marked per-function):

* ``gen2_sent_loss`` — the reference computes the score matrix from the
  *product of the embedding norms* instead of their dot products
  (Old_Code/code/miscc/losses.py:14-21), which makes every entry equal to
  GAMMA3 and the loss a constant log(B) with zero gradient.  We implement
  the evident intent — the cosine-similarity matrix of AttnGAN's
  ``sent_loss`` without class masking — and note the bug here.
* BCE losses consume logits (reference applies Sigmoid inside
  ``D_GET_OUTPUT`` then BCELoss) — same math, numerically stabler.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .gan import bce_logits


def gen2_sent_loss(sent_emb: jax.Array, img_code: jax.Array,
                   gamma3: float = 10.0) -> Tuple[jax.Array, jax.Array]:
    """Symmetric cross-entropy over the (B,B) cosine-similarity matrix
    (Old_Code/code/miscc/losses.py:6-27; see module docstring for the
    reference's norms-product bug)."""
    s = sent_emb.astype(jnp.float32)
    v = img_code.astype(jnp.float32)
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-8)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    scores0 = gamma3 * (v @ s.T)  # rows: images, cols: sentences
    scores1 = scores0.T
    labels = jnp.arange(scores0.shape[0])
    loss0 = -jnp.mean(jax.nn.log_softmax(scores0, axis=-1)[labels, labels])
    loss1 = -jnp.mean(jax.nn.log_softmax(scores1, axis=-1)[labels, labels])
    return loss0, loss1


def gen2_d_loss_bce(real_uncond, fake_uncond, cond_real, cond_fake,
                    cond_wrong) -> jax.Array:
    """BCE D loss with the wrong-pair term and the (real+cond)/2 +
    (fake+cond_fake+wrong)/3 weighting (Old_Code/code/miscc/losses.py:72-97).
    All inputs are logits."""
    real_err = bce_logits(real_uncond, 1.0)
    fake_err = bce_logits(fake_uncond, 0.0)
    cond_real_err = bce_logits(cond_real, 1.0)
    cond_fake_err = bce_logits(cond_fake, 0.0)
    cond_wrong_err = bce_logits(cond_wrong, 0.0)
    return ((real_err + cond_real_err) / 2.0
            + (fake_err + cond_fake_err + cond_wrong_err) / 3.0)


def gen2_g_loss_bce(fake_uncond, cond_fake, sent_emb, img_code,
                    lam: float, gamma3: float = 10.0) -> jax.Array:
    """BCE G loss + conditional term + sentence-matching loss * LAMBDA
    (Old_Code/code/miscc/losses.py:52-70)."""
    err = bce_logits(fake_uncond, 1.0) + bce_logits(cond_fake, 1.0)
    s0, s1 = gen2_sent_loss(sent_emb, img_code, gamma3)
    return err + lam * (s0 + s1)


def gen2_feature_gradient_penalty(feat_fn: Callable, real, fake, rng,
                                  weight: float = 10.0) -> jax.Array:
    """Epsilon-interpolated gradient penalty computed through the D *feature
    extractor* output sum — exactly what the reference penalizes
    (``calc_gradient_penalty`` passes ones as grad_outputs for the whole
    feature map, Old_Code/code/miscc/losses.py:29-50)."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), jnp.float32)
    x_hat = eps * real.astype(jnp.float32) + (1 - eps) * fake.astype(jnp.float32)

    def feat_sum(x):
        return jnp.sum(feat_fn(x).astype(jnp.float32))

    grads = jax.grad(feat_sum)(x_hat)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2, 3)) + 1e-12)
    return weight * jnp.mean((norms - 1.0) ** 2)


def gen2_d_loss_wgan(real_uncond, fake_uncond, cond_real, cond_fake,
                     cond_wrong, penalty) -> jax.Array:
    """WGAN critic loss with the reference's asymmetric weighting
    (Old_Code/code/miscc/losses.py:119-146):
    (fake + cond_fake + wrong)/3 - (real + cond_real)/2 + GP."""
    fake_term = (jnp.mean(fake_uncond) + jnp.mean(cond_fake)
                 + jnp.mean(cond_wrong)) / 3.0
    real_term = (jnp.mean(real_uncond) + jnp.mean(cond_real)) / 2.0
    return fake_term - real_term + penalty


def gen2_g_loss_wgan(fake_uncond, cond_fake) -> jax.Array:
    """WGAN G loss: -(mean(uncond) + mean(cond))/2
    (Old_Code/code/miscc/losses.py:99-117; the DAMSM term there is
    commented out)."""
    return -(jnp.mean(fake_uncond) + jnp.mean(cond_fake)) / 2.0
