"""Attention-map visualization.

Parity with the reference visualizers (`build_super_images` /
`build_super_images2` / `drawCaption`, AttnGAN2/code/miscc/utils.py:30-282),
the reference's main training observable (dumped every 1000 iters,
trainer.py:304-310; per caption in gen_example, trainer.py:503-518):

* per-word colored caption bands (COLOR_DIC, utils.py:17-26) with the
  reference's ``j:word`` labels (word truncated to 6 chars, utils.py:46-48);
* gaussian sigma=20 smoothing of the upsampled attention maps — the
  reference uses ``skimage.transform.pyramid_expand(sigma=20)``
  (utils.py:130-133); skimage is not in this image, so an equivalent
  separable gaussian after upsampling is implemented in numpy;
* the reference's grid layout: per sample a [caption band / raw-map row /
  overlay row] block, column 0 the image, column 1 the max-over-words map,
  then one column per word (utils.py:105-170); overlays alpha-paste the
  grayscale map over the image with alpha 210 (build1) / 180 (build2);
* build2's per-word threshold mask (2/num_words), confidence sort, and
  topK=5 selection (utils.py:214-268).

deviation: the FreeMono truetype font is not shipped here (the reference's
own checkout also falls back to the PIL default, utils.py:33-35); the PIL
default font at a similar size is used.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from sba_gan_tpu.utils.image import to_uint8

# reference COLOR_DIC (miscc/utils.py:17-26): per-word caption band colors
COLOR_DIC = {
    0: [128, 64, 128], 1: [244, 35, 232], 2: [70, 70, 70],
    3: [102, 102, 156], 4: [190, 153, 153], 5: [153, 153, 153],
    6: [250, 170, 30], 7: [220, 220, 0], 8: [107, 142, 35],
    9: [152, 251, 152], 10: [70, 130, 180], 11: [220, 20, 60],
    12: [255, 0, 0], 13: [0, 0, 142], 14: [119, 11, 32],
    15: [0, 60, 100], 16: [0, 80, 100], 17: [0, 0, 230],
    18: [0, 0, 70], 19: [0, 0, 0],
}
FONT_MAX = 50  # caption band height (utils.py:27)
PAD = 2
SMOOTH_SIGMA = 20.0  # pyramid_expand sigma (utils.py:130-133)


def _font(size: int = 30):
    try:
        return ImageFont.load_default(size=size)
    except TypeError:  # older PIL: fixed-size default
        return ImageFont.load_default()


@lru_cache(maxsize=16)
def _blur_operator(n: int, sigma: float) -> np.ndarray:
    """(n, n) linear operator = reflect-pad + 1-D gaussian, as a dense
    matrix.  A separable blur is then two BLAS matmuls (K @ a @ K.T)."""
    radius = max(1, int(3.0 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    # conv matrix over the padded axis: C[i, j] = k[j - i] (valid mode)
    m = n + 2 * radius
    conv = np.zeros((n, m), np.float32)
    for i in range(n):
        conv[i, i: i + 2 * radius + 1] = k
    # reflect-pad matrix: padded index -> source index (np.pad 'reflect')
    if radius >= n:
        # Multi-reflection regime (maps smaller than ~3*sigma px): the
        # single-bounce index formula below would deviate from np.pad
        # 'reflect' by up to ~0.08 (advisor r4) — fold the EXACT np.pad
        # reflect indices instead (cheap: n is tiny here).
        src = np.arange(n)
        idx = np.pad(src, radius, mode="reflect")
    else:
        idx = np.concatenate([
            np.arange(radius, 0, -1), np.arange(n),
            np.arange(n - 2, n - 2 - radius, -1),
        ])
    pad = np.zeros((m, n), np.float32)
    pad[np.arange(m), np.clip(idx, 0, n - 1)] = 1.0
    return conv @ pad


def _gaussian_blur_2d(a: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian filter (reflect padding), numpy only.

    Formulated as two matmuls against a cached (n, n) blur operator: the
    previous np.apply_along_axis/np.convolve loop cost ~8 ms per 256^2
    map (measured host fast-phase; the 1-core host is bursty up to ~10x
    slower) and an attention grid smooths ~19 maps x 2 stages per request
    — BLAS does the same math at 9-42x (max abs err 3.6e-7)."""
    if sigma <= 0:
        return a
    h, w = a.shape
    out = _blur_operator(h, float(sigma)) @ a.astype(np.float32)
    return out @ _blur_operator(w, float(sigma)).T


def _smooth_upsample(attn: np.ndarray, size: int,
                     sigma: float = SMOOTH_SIGMA) -> np.ndarray:
    """Upsample an (h, w) map to (size, size) and gaussian-smooth it —
    the role of the reference's pyramid_expand(sigma=20)."""
    h = attn.shape[0]
    up = np.asarray(
        Image.fromarray(attn.astype(np.float32), mode="F").resize(
            (size, size), Image.BILINEAR
        ),
        np.float32,
    )
    if size // max(h, 1) > 1:
        up = _gaussian_blur_2d(up, sigma)
    return up


def _overlay(img_u8: np.ndarray, map_u8: np.ndarray, alpha: int) -> np.ndarray:
    """Reference merge: paste the grayscale attention map over the image
    through a constant-alpha mask (utils.py:146-152)."""
    im = Image.fromarray(img_u8)
    att = Image.fromarray(np.repeat(map_u8[..., None], 3, axis=2))
    merged = Image.new("RGBA", im.size, (0, 0, 0, 0))
    mask = Image.new("L", im.size, alpha)
    merged.paste(im, (0, 0))
    merged.paste(att, (0, 0), mask)
    return np.array(merged)[:, :, :3]


def _caption_band(labels, width: int, cell_w: int, first_col: int,
                  colored: bool) -> np.ndarray:
    """One FONT_MAX-tall band: per-word colored cells + labels
    (reference text_convas + drawCaption, utils.py:30-75; build2's band is
    the near-black np.ones canvas, utils.py:183-186)."""
    band = np.ones((FONT_MAX, width, 3), np.uint8)
    if colored:
        band[:] = 255
        for j in range(len(labels)):
            x0 = (first_col + j) * cell_w
            band[:, x0: x0 + cell_w] = COLOR_DIC[j % len(COLOR_DIC)]
    im = Image.fromarray(band)
    d = ImageDraw.Draw(im)
    font = _font(30)
    for j, label in enumerate(labels):
        d.text(((first_col + j) * cell_w + 2, 8), label,
               font=font, fill=(255, 255, 255))
    return np.asarray(im, np.uint8)


def _resize_img(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape[0] == size:
        return to_uint8(img)
    return np.asarray(
        Image.fromarray(to_uint8(img)).resize((size, size), Image.BILINEAR)
    )


def build_super_images(
    images: np.ndarray,
    captions: np.ndarray,
    ixtoword: Dict[int, str],
    attn_maps: np.ndarray,
    att_size: Optional[int] = None,
    max_word_num: int = 18,
    max_vis: int = 8,
) -> np.ndarray:
    """Compose the attention-grid image (reference build_super_images,
    utils.py:54-176).

    images:    (B, H, W, 3) in [-1, 1] — generated images at the attention
               stage's resolution.
    captions:  (B, T) int ids (0 = pad).
    attn_maps: (B, h, w, T) word-attention maps (our WordAttention layout;
               the reference's is (B, T, h, w)).

    Per sample: [caption band | raw smoothed maps | overlays], columns =
    [image, max-over-words, word 0, word 1, ...]; maps are globally
    min/max-normalized within the sample (utils.py:126-143).
    """
    b = min(images.shape[0], max_vis)
    att_h = attn_maps.shape[1]
    vis_size = att_h * 16 if att_h == 17 else images.shape[1]
    t = captions.shape[1]
    n_words = min(t, max_word_num)
    cell_w = vis_size + PAD
    cols = n_words + 2  # image | max | words
    width = cols * cell_w

    blocks: List[np.ndarray] = []
    for i in range(b):
        img = _resize_img(np.asarray(images[i]), vis_size)
        attn = np.asarray(attn_maps[i], np.float32)  # (h, w, T)
        word_ids = [int(w) for w in captions[i][:n_words]]
        n_valid = next(
            (j for j, w in enumerate(word_ids) if w == 0), len(word_ids)
        )
        words = [ixtoword.get(w, "<?>") for w in word_ids[:n_valid]]

        # smoothed maps: index 0 = max over words (utils.py:108-111)
        maps = [_smooth_upsample(attn[:, :, :max(n_valid, 1)].max(-1),
                                 vis_size)]
        maps += [_smooth_upsample(attn[:, :, j], vis_size)
                 for j in range(n_valid)]
        lo = min(m.min() for m in maps)
        hi = max(m.max() for m in maps)
        span = (hi - lo) if hi > lo else 1.0
        maps_u8 = [
            np.clip((m - lo) / span * 255.0, 0, 255).astype(np.uint8)
            for m in maps
        ]

        raw_row = np.zeros((vis_size, width, 3), np.uint8)
        ovl_row = np.zeros((vis_size, width, 3), np.uint8)
        raw_row[:, :vis_size] = img
        ovl_row[:, :vis_size] = img
        for j, m in enumerate(maps_u8):
            x0 = (j + 1) * cell_w
            raw_row[:, x0: x0 + vis_size] = m[..., None]
            ovl_row[:, x0: x0 + vis_size] = _overlay(img, m, 210)

        labels = [f"{j}:{w[:6]}" for j, w in enumerate(words)]
        band = _caption_band(labels, width, cell_w, first_col=2,
                             colored=True)
        blocks.append(np.concatenate([band, raw_row, ovl_row], axis=0))
    return np.concatenate(blocks, axis=0)


def build_super_images2(
    images: Sequence[np.ndarray],
    captions: np.ndarray,
    cap_lens: np.ndarray,
    ixtoword: Dict[int, str],
    attn_maps: Sequence[np.ndarray],
    max_vis: int = 8,
    top_k: int = 5,
) -> np.ndarray:
    """gen_example variant (reference build_super_images2, utils.py:179-271):
    per-word maps are threshold-masked (2/num_words), individually
    normalized, ranked by confidence (mass above 2x threshold), and the
    top-K columns are shown as [caption band / overlay row] per sample."""
    b = min(len(captions), max_vis)
    imgs = np.asarray(images)
    if imgs.ndim == 3:
        imgs = imgs[None]
    vis_size = imgs.shape[1]
    cell_w = vis_size + PAD

    blocks: List[np.ndarray] = []
    for i in range(b):
        img = _resize_img(np.asarray(imgs[i]), vis_size)
        n = max(int(cap_lens[i]), 1)
        attn = np.asarray(attn_maps[i], np.float32)  # (h, w, T)
        words = [ixtoword.get(int(w), "<?>") for w in captions[i][:n]]
        thresh = 2.0 / float(n)

        maps, conf = [], []
        for j in range(n):
            m = attn[:, :, j]
            conf.append(float((m * (m > 2.0 * thresh)).sum()))
            m = m * (m > thresh)
            up = _smooth_upsample(m, vis_size)
            lo, hi = up.min(), up.max()
            maps.append((up - lo) / (hi - lo + 0.01))
        order = np.argsort(conf)[::-1][: min(top_k, n)]

        k = len(order)
        width = k * cell_w
        ovl_row = np.zeros((vis_size, width, 3), np.uint8)
        labels = []
        for col, idx in enumerate(order):
            m_u8 = np.clip(maps[idx] * 255.0, 0, 255).astype(np.uint8)
            ovl_row[:, col * cell_w: col * cell_w + vis_size] = _overlay(
                img, m_u8, 180
            )
            # labels keep each word's ORIGINAL index (the reference reorders
            # pre-drawn txt cells, utils.py:258-263)
            labels.append(f"{int(idx)}:{words[idx][:6]}")
        band = _caption_band(labels, width, cell_w, first_col=0,
                             colored=False)
        blocks.append(np.concatenate([band, ovl_row], axis=0))
    width = max(bl.shape[1] for bl in blocks)
    padded = [
        np.pad(bl, ((0, 0), (0, width - bl.shape[1]), (0, 0)),
               constant_values=255)
        for bl in blocks
    ]
    return np.concatenate(padded, axis=0)
