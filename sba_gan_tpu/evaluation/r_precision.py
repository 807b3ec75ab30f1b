"""R-precision: DAMSM-encoder retrieval metric (framework extension).

The AttnGAN model family (which the reference extends —
AttnGAN2/code/miscc/losses.py sent_loss cosine machinery,
docs/report/report.tex evaluates IS only) is conventionally also scored by
R-precision: for each generated image, rank its ground-truth caption against
``num_candidates - 1`` randomly drawn mismatched captions by cosine
similarity of the DAMSM global codes, and report the fraction of images
whose true caption lands in the top ``r``.

This module computes the metric from already-encoded global codes so it
works with any of the framework's text towers (RNN or BERT) and needs no
pretrained weights of its own — the DAMSM encoders under evaluation provide
the embedding space, exactly as in the original protocol.

Typical use::

    img_codes  = encode images    -> (N, D)   CNNEncoder pooled code
    sent_codes = encode captions  -> (N, D)   text encoder sentence code
    mean, std = r_precision_from_codes(img_codes, sent_codes, rng)

Everything here is host-side numpy: N x num_candidates x D is tiny next to
the encoder forward passes that produce the codes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _cosine(a: np.ndarray, b: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Row-wise cosine similarity between (N, D) and (N, K, D) -> (N, K)."""
    a = a / np.clip(np.linalg.norm(a, axis=-1, keepdims=True), eps, None)
    b = b / np.clip(np.linalg.norm(b, axis=-1, keepdims=True), eps, None)
    return np.einsum("nd,nkd->nk", a, b)


def r_precision_from_codes(
    img_codes: np.ndarray,
    sent_codes: np.ndarray,
    rng: np.random.Generator,
    num_candidates: int = 100,
    r: int = 1,
    trials: int = 3,
    class_ids: Optional[np.ndarray] = None,
) -> Tuple[float, float]:
    """R-precision over matched (image, caption) code pairs.

    img_codes:  (N, D) global image codes of generated images.
    sent_codes: (N, D) sentence codes; row i is the caption image i was
        generated from.
    num_candidates: candidate pool size per image (1 true + K-1 mismatched).
    r: success when the true caption ranks within the top ``r``.
    trials: independent mismatched-candidate draws; returns (mean, std)
        across trials.
    class_ids: optional (N,) labels — candidates drawn from the same class
        as the query are excluded (mirrors the class-masked training loss,
        losses/damsm.py sent_loss): a same-class "mismatch" is not a true
        negative for fine-grained datasets like CUB.

    Requires N > num_candidates (otherwise there are not enough distinct
    mismatched captions to fill a pool).
    """
    img_codes = np.asarray(img_codes, np.float32)
    sent_codes = np.asarray(sent_codes, np.float32)
    n = img_codes.shape[0]
    k = num_candidates - 1
    if img_codes.shape[0] != sent_codes.shape[0]:
        raise ValueError(
            f"matched pairs required: {img_codes.shape} vs {sent_codes.shape}")
    if n <= num_candidates:
        raise ValueError(
            f"need more pairs ({n}) than candidates ({num_candidates})")

    scores = []
    for _ in range(trials):
        # Draw k mismatched caption indices per image, excluding the true
        # caption (and optionally its whole class).  Rejection-free: sample
        # from a shifted range then skip over the query index.
        draws = rng.integers(0, n - 1, size=(n, k))
        draws = draws + (draws >= np.arange(n)[:, None])
        if class_ids is not None:
            cid = np.asarray(class_ids)
            bad = cid[draws] == cid[:, None]
            while bad.any():
                redraw = rng.integers(0, n - 1, size=int(bad.sum()))
                rows = np.nonzero(bad)[0]
                redraw = redraw + (redraw >= rows)
                draws[bad] = redraw
                bad = cid[draws] == cid[:, None]
        cand = np.concatenate(
            [sent_codes[:, None, :], sent_codes[draws]], axis=1
        )  # (N, num_candidates, D); true caption at column 0
        sims = _cosine(img_codes, cand)  # (N, num_candidates)
        # rank of the true caption = number of strictly-better mismatches
        rank = (sims[:, 1:] > sims[:, :1]).sum(axis=1)
        scores.append(float((rank < r).mean()))
    return float(np.mean(scores)), float(np.std(scores))
