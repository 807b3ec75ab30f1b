"""Adversarial and KL losses, TPU-native.

Capability parity with the reference GAN losses
(AttnGAN2/code/miscc/losses.py:136-214): per-scale discriminator loss with
conditional, unconditional and "wrong pair" terms in the exact reference
weighting, generator loss with DAMSM ranking terms on the final scale, and
the conditioning-augmentation KL.

The discriminator heads return raw logits; BCE is computed from logits
(softplus form) — exactly the reference Sigmoid+BCELoss math with stable
numerics.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from sba_gan_tpu.losses.damsm import sent_loss, words_loss


def bce_logits(logits: jax.Array, target: float) -> jax.Array:
    """Mean binary cross entropy from logits against a constant target
    (reference uses nn.BCELoss over sigmoid outputs)."""
    logits = logits.astype(jnp.float32)
    # softplus(l) - target * l == -(target*log(sigmoid) + (1-t)*log(1-sigmoid))
    return jnp.mean(jax.nn.softplus(logits) - target * logits)


def discriminator_loss(
    d_backbone: Callable,
    d_cond: Callable,
    d_uncond,  # Callable or None
    real_imgs: jax.Array,
    fake_imgs: jax.Array,
    sent_emb: jax.Array,
) -> jax.Array:
    """One scale's D loss (reference discriminator_loss, losses.py:136-161).

    d_backbone(img) -> 4x4 code; d_cond(code, sent) -> logits;
    d_uncond(code) -> logits or None.  fake_imgs must already be detached
    (jax.lax.stop_gradient) by the caller.
    """
    real_f = d_backbone(real_imgs)
    fake_f = d_backbone(fake_imgs)

    cond_real = bce_logits(d_cond(real_f, sent_emb), 1.0)
    cond_fake = bce_logits(d_cond(fake_f, sent_emb), 0.0)
    # "wrong pair": real image i vs caption i+1 (losses.py:148-150).
    cond_wrong = bce_logits(d_cond(real_f[:-1], sent_emb[1:]), 0.0)

    if d_uncond is not None:
        real = bce_logits(d_uncond(real_f), 1.0)
        fake = bce_logits(d_uncond(fake_f), 0.0)
        return (real + cond_real) / 2.0 + (fake + cond_fake + cond_wrong) / 3.0
    return cond_real + (cond_fake + cond_wrong) / 2.0


def generator_loss(
    d_fns: Sequence[Tuple[Callable, Callable, object]],
    image_encoder: Callable,
    fake_imgs: Sequence[jax.Array],
    words_embs: jax.Array,
    sent_emb: jax.Array,
    match_labels: jax.Array,
    cap_lens: jax.Array,
    class_ids: jax.Array,
    gamma1: float,
    gamma2: float,
    gamma3: float,
    smooth_lambda: float,
):
    """Total G loss (reference generator_loss, losses.py:164-206).

    d_fns: per scale (backbone, cond_head, uncond_head-or-None).
    image_encoder(img) -> (region_features (B,R,D), cnn_code (B,D)).
    Returns (errG_total, logs dict of per-term scalars).
    """
    logs = {}
    total = 0.0
    n = len(d_fns)
    for i, (backbone, cond, uncond) in enumerate(d_fns):
        features = backbone(fake_imgs[i])
        g_loss = bce_logits(cond(features, sent_emb), 1.0)
        if uncond is not None:
            g_loss = g_loss + bce_logits(uncond(features), 1.0)
        logs[f"g_loss{i}"] = g_loss
        total = total + g_loss

        if i == n - 1:
            region_features, cnn_code = image_encoder(fake_imgs[i])
            w0, w1 = words_loss(
                region_features,
                words_embs,
                match_labels,
                cap_lens,
                class_ids,
                gamma1=gamma1,
                gamma2=gamma2,
                gamma3=gamma3,
            )
            w_loss = (w0 + w1) * smooth_lambda
            s0, s1 = sent_loss(
                cnn_code, sent_emb, match_labels, class_ids, gamma3=gamma3
            )
            s_loss = (s0 + s1) * smooth_lambda
            total = total + w_loss + s_loss
            logs["w_loss"] = w_loss
            logs["s_loss"] = s_loss
    return total, logs


def kl_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(q(c|s) || N(0, I)) on the CA posterior (reference KL_loss,
    losses.py:210-214): -0.5 * mean(1 + logvar - mu^2 - exp(logvar))."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * jnp.mean(1.0 + logvar - mu * mu - jnp.exp(logvar))


# --------------------------------------------------------------------------
# Legacy loss modes (reference Old_Code: WGAN-GP and R1) — config-gated
# extras subsumed by the unified framework (SURVEY.md L5/L9).
# --------------------------------------------------------------------------


def wgan_d_loss(real_scores, fake_scores, drift: float = 0.001):
    """WGAN critic loss with drift term (Old_Code/train.py:200-233)."""
    real_scores = real_scores.astype(jnp.float32)
    fake_scores = fake_scores.astype(jnp.float32)
    return (
        fake_scores.mean()
        - real_scores.mean()
        + drift * jnp.mean(real_scores ** 2)
    )


def wgan_gradient_penalty(d_fn: Callable, real, fake, rng, weight=10.0):
    """Epsilon-interpolated gradient penalty (Old_Code/train.py:234-263)."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), jnp.float32)
    x_hat = eps * real.astype(jnp.float32) + (1 - eps) * fake.astype(jnp.float32)

    def score_sum(x):
        return jnp.sum(d_fn(x))

    grads = jax.grad(score_sum)(x_hat)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2, 3)) + 1e-12)
    return weight * jnp.mean((norms - 1.0) ** 2)


def r1_d_loss(d_fn: Callable, real, fake_scores, gamma: float = 10.0):
    """R1: softplus real/fake + gradient penalty on reals
    (Old_Code/train.py:206-270)."""

    def score_sum(x):
        return jnp.sum(d_fn(x))

    real_scores = d_fn(real)
    grads = jax.grad(score_sum)(real.astype(jnp.float32))
    penalty = 0.5 * gamma * jnp.mean(jnp.sum(grads ** 2, axis=(1, 2, 3)))
    loss = (
        jnp.mean(jax.nn.softplus(-real_scores))
        + jnp.mean(jax.nn.softplus(fake_scores))
        + penalty
    )
    return loss


def wgan_g_loss(fake_scores):
    return -jnp.mean(fake_scores.astype(jnp.float32))
