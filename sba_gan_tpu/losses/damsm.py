"""DAMSM text-image matching losses, TPU-native.

Capability parity with the reference losses (AttnGAN2/code/miscc/losses.py):

* :func:`sent_loss` — global image code vs sentence code cosine score matrix,
  gamma3 scaling, same-class masking, symmetric cross-entropy
  (losses.py:20-59).
* :func:`words_loss` — word-to-region attention similarity
  (losses.py:62-132).  The reference loops over the batch in Python, running
  a variable-length `func_attention` per sample — the single biggest
  XLA-hostility in the codebase (SURVEY.md hard-part #1).  Here the whole
  (text_i, image_j) grid is computed as masked dense einsums at static shape:
  one (B, B, T, R) attention tensor, masked softmaxes, and a masked
  log-sum-exp over true word counts only.  Numerics match the reference loop
  on valid positions exactly.

Class masking: scores between different samples of the same class are
excluded (-inf) from the contrastive softmax, mirroring losses.py:24-34.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9
EPS = 1e-8

_FALLBACK_WARNED = False


def _warn_fallback(impl: str, reason: str) -> None:
    """One-time warning when a non-'xla' impl silently takes the dense XLA
    path, so a perf A/B can never mislabel the measured implementation
    (advisor round-2 finding)."""
    global _FALLBACK_WARNED
    if not _FALLBACK_WARNED:
        _FALLBACK_WARNED = True
        warnings.warn(
            f"words_loss impl={impl!r} fell back to the dense XLA grid "
            f"({reason}); measurements in this process exercise the XLA "
            "path, not the kernel.",
            stacklevel=3,
        )


def _class_mask(class_ids: jax.Array) -> jax.Array:
    """(B, B) bool: True where sample pair shares a class but is not the
    diagonal (reference mask construction, losses.py:24-29)."""
    same = class_ids[:, None] == class_ids[None, :]
    eye = jnp.eye(class_ids.shape[0], dtype=bool)
    return same & ~eye


def _masked_cross_entropy(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over rows; `scores` already has masked entries at NEG_INF."""
    logz = jax.scipy.special.logsumexp(scores, axis=1)
    picked = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    return jnp.mean(logz - picked)


def sent_loss(
    cnn_code: jax.Array,
    rnn_code: jax.Array,
    labels: jax.Array,
    class_ids: Optional[jax.Array],
    gamma3: float = 10.0,
) -> Tuple[jax.Array, jax.Array]:
    """Sentence-level DAMSM loss (reference sent_loss, losses.py:20-59).

    cnn_code, rnn_code: (B, D); labels: (B,) int (arange(B) in training).
    Returns (loss0, loss1): image->text and text->image CE.
    """
    cnn_code = cnn_code.astype(jnp.float32)
    rnn_code = rnn_code.astype(jnp.float32)
    scores = cnn_code @ rnn_code.T  # (B, B)
    cnn_norm = jnp.linalg.norm(cnn_code, axis=1, keepdims=True)
    rnn_norm = jnp.linalg.norm(rnn_code, axis=1, keepdims=True)
    norms = jnp.clip(cnn_norm @ rnn_norm.T, min=EPS)
    scores = scores / norms * gamma3
    if class_ids is not None:
        scores = jnp.where(_class_mask(class_ids), NEG_INF, scores)
    loss0 = _masked_cross_entropy(scores, labels)
    loss1 = _masked_cross_entropy(scores.T, labels)
    return loss0, loss1


def words_loss(
    img_features: jax.Array,
    words_emb: jax.Array,
    labels: jax.Array,
    cap_lens: jax.Array,
    class_ids: Optional[jax.Array],
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    gamma3: float = 10.0,
    return_attn: bool = False,
    einsum_dtype=jnp.float32,
    grid_chunks: int = 1,
    impl: str = "xla",
    tile_i: int = 16,
    fold_softmax: bool = False,
):
    """Word-level DAMSM loss (reference words_loss, losses.py:62-132), fully
    batched.

    img_features: (B, R, D) region features (reference: (B, D, 17, 17)).
    words_emb:    (B, T, D) word embeddings (reference: (B, D, T)).
    cap_lens:     (B,) true word counts; positions t >= len are padding.
    labels:       (B,) int matching labels (arange(B) in training).

    Returns (loss0, loss1) and, when return_attn, the per-sample attention
    maps attn[i] of text i over its own image, (B, T, R) — the reference's
    att_maps visualization payload (losses.py:92).

    einsum_dtype: input dtype for the three (B,B,T,R)-scale einsums
    (cfg.JAX.LOSS_DTYPE).  bfloat16 halves the HBM traffic of the
    attention-grid tensors and runs the matmuls at full MXU rate;
    accumulation and every softmax/log-sum-exp stay float32.

    grid_chunks: split the (B_text, B_img, T, R) grid over the *image*
    axis into this many sequential chunks (lax.map + checkpoint): every
    term of the grid math is independent across images, so peak memory
    divides by the chunk count while numerics are bit-identical.  Unlocks
    per-chip batches whose full grid would not fit HBM
    (cfg.JAX.DAMSM_GRID_CHUNKS).

    impl: 'xla' — the dense-grid reference formulation below;
    'pallas' — the fused flash-style kernel (ops/damsm_sim.py): never
    materializes the (B,B,T,R) grid in HBM, custom flash VJP; falls back
    to XLA when return_attn is requested or B % tile_i != 0.
    'interpret' — the Pallas kernel on the CPU interpreter (tests).

    fold_softmax (XLA path only): compute Eq. 9 directly from the raw
    scores — attn = softmax_r(gamma1 * exp(scores - logsumexp_t(scores)))
    — instead of materializing the Eq. 8 softmax output first.  Same math
    (exp(x - lse(x)) IS the softmax, including the fully-masked-row
    uniform limit), one fewer (B, B, T, R) HBM materialization on the
    dense path.  cfg.JAX.DAMSM_FOLD_SOFTMAX.
    """
    img = img_features.astype(jnp.float32)
    words = words_emb.astype(jnp.float32)
    b, t, d = words.shape
    r = img.shape[1]

    if impl != "xla" and (return_attn or b % tile_i != 0):
        _warn_fallback(
            impl,
            "return_attn requested" if return_attn
            else f"batch {b} not divisible by tile_i {tile_i}",
        )
    if impl != "xla" and not return_attn and b % tile_i == 0:
        from sba_gan_tpu.ops.damsm_sim import damsm_sim

        sim = damsm_sim(
            words, img, cap_lens, gamma1, gamma2,
            tile_i=tile_i, mm_dtype=einsum_dtype,
            interpret=(impl == "interpret"),
        )
        similarities = sim.T * gamma3
        if class_ids is not None:
            similarities = jnp.where(
                _class_mask(class_ids), NEG_INF, similarities)
        loss0 = _masked_cross_entropy(similarities, labels)
        loss1 = _masked_cross_entropy(similarities.T, labels)
        return loss0, loss1

    img_e = img.astype(einsum_dtype)
    words_e = words.astype(einsum_dtype)

    word_valid = jnp.arange(t)[None, :] < cap_lens[:, None]  # (B_text, T)
    wmask = word_valid[:, None, :, None]  # (B_text, 1, T, 1)
    wnorm = jnp.linalg.norm(words, axis=2)[:, None, :]  # (B_text,1,T)

    def grid_sim(img_chunk_e):
        """(B_text, Bc) similarity block for one image chunk."""
        # Eq. 7: scores[i,j,t,r] — text i's word t vs image j's region r.
        scores = jnp.einsum(
            "itd,jrd->ijtr", words_e, img_chunk_e,
            preferred_element_type=jnp.float32
        )
        masked = jnp.where(wmask, scores, NEG_INF)
        if fold_softmax:
            # Eq. 8 folded into Eq. 9: softmax_t(x) == exp(x - lse_t(x)),
            # so the word-softmax never needs its own (B,B,T,R) output —
            # only the (B,B,1,R) log-normalizer.  Bitwise-different but
            # mathematically identical to the two-pass form (incl. the
            # fully-masked-row uniform limit: exp(-1e9 - (-1e9 + log T))
            # = 1/T).
            lse_t = jax.scipy.special.logsumexp(masked, axis=2,
                                                keepdims=True)
            attn = jax.nn.softmax(gamma1 * jnp.exp(masked - lse_t), axis=3)
        else:
            # Eq. 8: softmax over words of text i (valid words only).
            attn = jax.nn.softmax(masked, axis=2)
            # Eq. 9: gamma1-sharpened softmax over regions.
            attn = jax.nn.softmax(gamma1 * attn, axis=3)
        # Weighted region context per (text, image, word).
        context = jnp.einsum(
            "ijtr,jrd->ijtd", attn.astype(einsum_dtype), img_chunk_e,
            preferred_element_type=jnp.float32
        )
        # Cosine similarity word <-> context (reference cosine_similarity,
        # losses.py:11-17), then Eq. 10: gamma2 log-sum-exp over words.
        num = jnp.einsum("itd,ijtd->ijt", words_e,
                         context.astype(einsum_dtype),
                         preferred_element_type=jnp.float32)
        cnorm = jnp.linalg.norm(context, axis=3)  # (B_text,Bc,T)
        row_sim = num / jnp.clip(wnorm * cnorm, min=EPS)
        row_sim = jnp.where(word_valid[:, None, :], gamma2 * row_sim,
                            NEG_INF)
        return jax.scipy.special.logsumexp(row_sim, axis=2), attn

    if grid_chunks > 1:
        assert not return_attn, "return_attn requires grid_chunks=1"
        assert b % grid_chunks == 0, (b, grid_chunks)
        chunked = img_e.reshape(grid_chunks, b // grid_chunks, r, d)
        sim_blocks = jax.lax.map(
            jax.checkpoint(lambda ic: grid_sim(ic)[0]), chunked
        )  # (chunks, B_text, Bc)
        sim = jnp.concatenate(list(sim_blocks), axis=1)  # (B_text, B_img)
    else:
        sim, attn = grid_sim(img_e)

    # similarities[i_img, j_text] in the reference (losses.py:111-115).
    similarities = sim.T * gamma3
    if class_ids is not None:
        similarities = jnp.where(_class_mask(class_ids), NEG_INF, similarities)
    loss0 = _masked_cross_entropy(similarities, labels)
    loss1 = _masked_cross_entropy(similarities.T, labels)

    if return_attn:
        diag = jnp.einsum("iitr->itr", attn)  # text i over its own image
        return loss0, loss1, diag
    return loss0, loss1
