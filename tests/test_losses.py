"""Numerical parity tests for the DAMSM/GAN losses against a torch oracle
implementing the reference equations (per-sample loop, PackedSequence-free).

The oracle re-derives the math from the AttnGAN paper Eqs. 7-10 and the
reference behavior description (SURVEY.md A15/A26/A27) — variable-length
per-sample attention — so the batched masked-einsum implementation is checked
against genuinely independent code.
"""

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sba_gan_tpu.losses import (
    bce_logits,
    kl_loss,
    sent_loss,
    words_loss,
)

B, T, R, D = 6, 7, 9, 16
G1, G2, G3 = 4.0, 5.0, 10.0


def _torch_sent_loss(cnn, rnn, class_ids, g3):
    scores = cnn @ rnn.T
    norms = cnn.norm(dim=1, keepdim=True) @ rnn.norm(dim=1, keepdim=True).T
    scores = scores / norms.clamp(min=1e-8) * g3
    mask = (class_ids[:, None] == class_ids[None, :]) & ~torch.eye(
        len(class_ids), dtype=torch.bool
    )
    scores = scores.masked_fill(mask, float("-inf"))
    labels = torch.arange(len(class_ids))
    return (
        F.cross_entropy(scores, labels).item(),
        F.cross_entropy(scores.T, labels).item(),
    )


def _torch_words_loss(img, words, cap_lens, class_ids, g1, g2, g3):
    """Per-sample loop oracle: for text i (true length L), attend its words
    over every image's regions; Eq. 8 softmax over words, Eq. 9 sharpened
    softmax over regions, cosine rows, Eq. 10 log-sum-exp."""
    bsz = img.shape[0]
    sims = torch.zeros(bsz, bsz)  # [image j, text i]
    for i in range(bsz):
        L = int(cap_lens[i])
        w = words[i, :L]  # (L, D)
        # scores: (B_img, L, R)
        scores = torch.einsum("ld,brd->blr", w, img)
        attn = F.softmax(scores, dim=1)  # over words
        attn = F.softmax(g1 * attn, dim=2)  # over regions
        ctx = torch.einsum("blr,brd->bld", attn, img)
        num = torch.einsum("ld,bld->bl", w, ctx)
        den = (w.norm(dim=1)[None, :] * ctx.norm(dim=2)).clamp(min=1e-8)
        row_sim = num / den  # (B_img, L)
        sims[:, i] = torch.logsumexp(g2 * row_sim, dim=1)
    sims = sims * g3
    mask = (class_ids[:, None] == class_ids[None, :]) & ~torch.eye(
        bsz, dtype=torch.bool
    )
    sims = sims.masked_fill(mask, float("-inf"))
    labels = torch.arange(bsz)
    return (
        F.cross_entropy(sims, labels).item(),
        F.cross_entropy(sims.T, labels).item(),
    )


@pytest.fixture
def data(rng):
    img = rng.standard_normal((B, R, D)).astype(np.float32)
    words = rng.standard_normal((B, T, D)).astype(np.float32)
    cap_lens = np.array([7, 3, 5, 1, 6, 4], dtype=np.int32)
    class_ids = np.array([1, 2, 1, 3, 4, 2], dtype=np.int32)
    cnn = rng.standard_normal((B, D)).astype(np.float32)
    rnn = rng.standard_normal((B, D)).astype(np.float32)
    return img, words, cap_lens, class_ids, cnn, rnn


def test_sent_loss_matches_torch(data):
    *_, class_ids, cnn, rnn = data
    l0, l1 = sent_loss(
        jnp.asarray(cnn), jnp.asarray(rnn), jnp.arange(B), jnp.asarray(class_ids),
        gamma3=G3,
    )
    t0, t1 = _torch_sent_loss(
        torch.from_numpy(cnn), torch.from_numpy(rnn), torch.from_numpy(class_ids), G3
    )
    np.testing.assert_allclose(float(l0), t0, rtol=1e-5)
    np.testing.assert_allclose(float(l1), t1, rtol=1e-5)


def test_words_loss_matches_torch_loop(data):
    img, words, cap_lens, class_ids, *_ = data
    l0, l1 = words_loss(
        jnp.asarray(img),
        jnp.asarray(words),
        jnp.arange(B),
        jnp.asarray(cap_lens),
        jnp.asarray(class_ids),
        gamma1=G1,
        gamma2=G2,
        gamma3=G3,
    )
    t0, t1 = _torch_words_loss(
        torch.from_numpy(img),
        torch.from_numpy(words),
        cap_lens,
        torch.from_numpy(class_ids),
        G1,
        G2,
        G3,
    )
    np.testing.assert_allclose(float(l0), t0, rtol=1e-4)
    np.testing.assert_allclose(float(l1), t1, rtol=1e-4)


def test_words_loss_ignores_padding(data):
    """Garbage in padded word slots must not change the loss."""
    img, words, cap_lens, class_ids, *_ = data
    args = dict(
        labels=jnp.arange(B),
        cap_lens=jnp.asarray(cap_lens),
        class_ids=jnp.asarray(class_ids),
        gamma1=G1, gamma2=G2, gamma3=G3,
    )
    l0a, l1a = words_loss(jnp.asarray(img), jnp.asarray(words), **args)
    words2 = words.copy()
    for i in range(B):
        words2[i, cap_lens[i]:] = 1000.0
    l0b, l1b = words_loss(jnp.asarray(img), jnp.asarray(words2), **args)
    np.testing.assert_allclose(float(l0a), float(l0b), rtol=1e-5)
    np.testing.assert_allclose(float(l1a), float(l1b), rtol=1e-5)


def test_kl_loss_matches_torch(rng):
    mu = rng.standard_normal((B, 10)).astype(np.float32)
    logvar = rng.standard_normal((B, 10)).astype(np.float32)
    got = float(kl_loss(jnp.asarray(mu), jnp.asarray(logvar)))
    tmu, tlv = torch.from_numpy(mu), torch.from_numpy(logvar)
    want = (-0.5 * torch.mean(1 + tlv - tmu.pow(2) - tlv.exp())).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_logits_matches_torch(rng):
    logits = rng.standard_normal(32).astype(np.float32)
    for target in (0.0, 1.0):
        got = float(bce_logits(jnp.asarray(logits), target))
        t = torch.from_numpy(logits)
        want = F.binary_cross_entropy(
            torch.sigmoid(t), torch.full_like(t, target)
        ).item()
        np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="XLA-CPU has no BF16xBF16=F32 dot; bf16 loss einsums are "
           "TPU-path only (validated on-chip, see NOTES.md)")
def test_words_loss_bf16_einsum_close_to_f32(rng):
    """JAX.LOSS_DTYPE=bfloat16 runs the attention-grid einsums in bf16
    (f32 accumulation/softmax); losses must stay close to the f32 path."""
    import jax.numpy as jnp

    from sba_gan_tpu.losses.damsm import words_loss

    b, t, r, d = 6, 5, 9, 16
    img = jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(2, t + 1, (b,)).astype(np.int32))
    cids = jnp.asarray(rng.integers(0, 3, (b,)).astype(np.int32))
    labels = jnp.arange(b)
    f32 = words_loss(img, words, labels, lens, cids)
    bf16 = words_loss(img, words, labels, lens, cids,
                      einsum_dtype=jnp.bfloat16)
    for a, c in zip(f32, bf16):
        np.testing.assert_allclose(float(a), float(c), rtol=0.05, atol=0.02)


def test_words_loss_grid_chunks_bit_identical(rng):
    """DAMSM_GRID_CHUNKS splits the (B,B,T,R) grid over the image axis;
    losses and gradients must match the unchunked path."""
    from sba_gan_tpu.losses.damsm import words_loss

    b, t, r, d = 8, 5, 9, 16
    img = jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(2, t + 1, (b,)).astype(np.int32))
    cids = jnp.asarray(rng.integers(0, 3, (b,)).astype(np.int32))
    labels = jnp.arange(b)
    full = words_loss(img, words, labels, lens, cids)
    chunked = words_loss(img, words, labels, lens, cids, grid_chunks=4)
    for a, c in zip(full, chunked):
        np.testing.assert_allclose(float(a), float(c), rtol=1e-6)
    g_full = jax.grad(
        lambda i: sum(words_loss(i, words, labels, lens, cids)))(img)
    g_chunk = jax.grad(
        lambda i: sum(words_loss(i, words, labels, lens, cids,
                                 grid_chunks=4)))(img)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(AssertionError):
        words_loss(img, words, labels, lens, cids, grid_chunks=4,
                   return_attn=True)


def test_words_loss_fold_softmax_matches_two_pass(rng):
    """DAMSM_FOLD_SOFTMAX computes Eq.9 from exp(scores - lse_t(scores))
    instead of materializing the Eq.8 softmax output; values and grads
    must match the two-pass form (same math, different fp path), incl.
    with padding garbage present."""
    from sba_gan_tpu.losses.damsm import words_loss

    b, t, r, d = 8, 5, 9, 16
    img = jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32))
    words = np.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = rng.integers(2, t + 1, (b,)).astype(np.int32)
    for i in range(b):
        words[i, lens[i]:] = 37.0  # garbage in padded slots
    words = jnp.asarray(words)
    lens = jnp.asarray(lens)
    cids = jnp.asarray(rng.integers(0, 3, (b,)).astype(np.int32))
    labels = jnp.arange(b)

    two = words_loss(img, words, labels, lens, cids)
    fold = words_loss(img, words, labels, lens, cids, fold_softmax=True)
    for a, c in zip(two, fold):
        np.testing.assert_allclose(float(a), float(c), rtol=1e-5)

    g_two = jax.grad(
        lambda i, w: sum(words_loss(i, w, labels, lens, cids)),
        argnums=(0, 1))(img, words)
    g_fold = jax.grad(
        lambda i, w: sum(words_loss(i, w, labels, lens, cids,
                                    fold_softmax=True)),
        argnums=(0, 1))(img, words)
    for a, c in zip(g_two, g_fold):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)

    # chunked grid path composes with fold
    fold_c = words_loss(img, words, labels, lens, cids, fold_softmax=True,
                        grid_chunks=4)
    for a, c in zip(fold, fold_c):
        np.testing.assert_allclose(float(a), float(c), rtol=1e-6)
