"""Word/region attention, TPU-native.

Capability parity with the reference GlobalAttention
(AttnGAN2/code/GlobalAttention.py):

* :class:`WordAttention` — the generator-side module
  (GlobalAttentionGeneral, GlobalAttention.py:72-121): image features query
  word features, masked softmax over words, per-pixel word context.
* :func:`damsm_attention` — `func_attention` (GlobalAttention.py:31-69):
  words query image regions; softmax over words (Eq. 8), then a
  gamma1-sharpened softmax over regions (Eq. 9).

Layout convention (TPU-native, channels last): image features are NHWC and
word embeddings are (B, T, D) — the reference uses (B, D, T).  Masks are
boolean (B, T) with True == padding (same convention as the reference's
``captions == 0``).  Softmax over a masked axis uses a large negative fill
instead of -inf so that a fully-masked row produces zeros instead of NaN
(reference edge case at GlobalAttention.py:105-108; real captions always
have >= 1 word, so results agree).

The fused Pallas path for the generator-side attention lives in
``sba_gan_tpu.ops.word_attention``; this module is the XLA reference
implementation and the fallback for non-TPU backends.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sba_gan_tpu.models.blocks import ortho_init

NEG_INF = -1e9


def masked_softmax(logits: jax.Array, pad_mask: Optional[jax.Array], axis: int):
    """Softmax along ``axis`` with padded positions (pad_mask True) excluded."""
    logits = logits.astype(jnp.float32)
    if pad_mask is not None:
        logits = jnp.where(pad_mask, NEG_INF, logits)
    return jax.nn.softmax(logits, axis=axis)


class WordAttention(nn.Module):
    """Image-query word attention (reference GlobalAttentionGeneral).

    Args to __call__:
      h:      (B, H, W, idf) image features (query).
      words:  (B, T, cdf) word embeddings (context).
      pad_mask: (B, T) bool, True where the token is padding, or None.

    Returns:
      context: (B, H, W, idf) per-pixel weighted word context.
      attn:    (B, H, W, T) attention maps (reference returns (B, T, H, W)).
    """

    idf: int
    dtype: Any = jnp.float32
    impl: str = "auto"  # 'auto' | 'pallas' | 'xla' | 'interpret'

    @nn.compact
    def __call__(self, h, words, pad_mask=None):
        from sba_gan_tpu.ops.word_attention import word_attention

        b, ih, iw, idf = h.shape
        t = words.shape[1]
        # 1x1 conv over words == a Dense on the word axis (reference applies
        # conv1x1 on a (B, cdf, T, 1) view, GlobalAttention.py:95-97).
        source = nn.Dense(
            self.idf, use_bias=False, dtype=self.dtype, kernel_init=ortho_init
        )(words)  # (B, T, idf)

        query = h.reshape(b, ih * iw, idf)  # (B, QL, idf)
        # fused scores -> masked softmax over words -> context
        # (Pallas on TPU; XLA fallback preserves identical semantics)
        context, attn = word_attention(query, source, pad_mask, impl=self.impl)
        return (
            context.astype(h.dtype).reshape(b, ih, iw, idf),
            attn.astype(h.dtype).reshape(b, ih, iw, t),
        )


def damsm_attention(
    words: jax.Array,
    regions: jax.Array,
    gamma1: float,
    word_pad_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """DAMSM attention (reference func_attention, GlobalAttention.py:31-69).

    words:   (B, T, D) word queries.
    regions: (B, R, D) image region features (reference passes (B, D, 17, 17)).
    word_pad_mask: (B, T) bool, True == padding.  The reference avoids the
      mask by slicing each caption to its true length; here padded words are
      excluded from the Eq.-8 softmax instead (identical math on valid rows).

    Returns:
      context: (B, T, D) region context per word.
      attn:    (B, T, R) region attention per word (Eq. 9).
    """
    # Eq. 7: raw scores region x word.
    scores = jnp.einsum(
        "btd,brd->btr", words, regions, preferred_element_type=jnp.float32
    )  # (B, T, R)
    # Eq. 8: softmax over *words* for each region.
    mask = None if word_pad_mask is None else word_pad_mask[:, :, None]
    attn = masked_softmax(scores, mask, axis=1)
    # Eq. 9: sharpen by gamma1, softmax over *regions* for each word.
    attn = jax.nn.softmax(gamma1 * attn, axis=2)
    context = jnp.einsum(
        "btr,brd->btd", attn, regions.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return context, attn
