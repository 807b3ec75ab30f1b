"""Attention-map visualization.

Capability parity with the reference visualizers (`build_super_images` /
`build_super_images2` / `drawCaption`, AttnGAN2/code/miscc/utils.py:30-282):
a grid image per batch where each sample contributes a row of
[generated image | per-word attention overlays] with the word drawn above
each column.  The reference smooths attention with skimage
``pyramid_expand`` (sigma=20); this environment has no skimage, so a PIL
bilinear upsample provides the smoothing — same qualitative output, no
algorithmic dependence.

These images are the reference's main training observable (dumped every 1000
iters, trainer.py:304-310; per caption in gen_example, trainer.py:503-518).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from sba_gan_tpu.utils.image import to_uint8

FONT_SIZE = 12
TEXT_BAND = 16  # pixels reserved above each row for the word captions
PAD = 2


def _font():
    try:
        return ImageFont.load_default(size=FONT_SIZE)
    except TypeError:  # older PIL
        return ImageFont.load_default()


def _colorize(attn: np.ndarray) -> np.ndarray:
    """(h, w) attention in [0,1] -> (h, w, 3) red-channel heatmap."""
    a = np.clip(attn, 0.0, 1.0)
    heat = np.zeros(a.shape + (3,), np.float32)
    heat[..., 0] = a  # red
    heat[..., 2] = 1.0 - a  # blue
    return heat


def _upsample(attn: np.ndarray, size: int) -> np.ndarray:
    im = Image.fromarray((np.clip(attn, 0, 1) * 255).astype(np.uint8))
    return np.asarray(im.resize((size, size), Image.BILINEAR), np.float32) / 255.0


def build_super_images(
    images: np.ndarray,
    captions: np.ndarray,
    ixtoword: Dict[int, str],
    attn_maps: np.ndarray,
    att_size: Optional[int] = None,
    max_word_num: int = 18,
    max_vis: int = 8,
) -> np.ndarray:
    """Compose the attention-grid image (reference build_super_images).

    images:    (B, H, W, 3) in [-1, 1] — generated images at the attention
               stage's resolution.
    captions:  (B, T) int ids (0 = pad).
    attn_maps: (B, h, w, T) word-attention maps (our WordAttention layout;
               the reference's is (B, T, h, w)).
    Returns an (rows*(H+TEXT_BAND+PAD), cols*(W+PAD), 3) uint8 array.
    """
    b = min(images.shape[0], max_vis)
    size = images.shape[1]
    t = captions.shape[1]
    n_words = min(t, max_word_num)
    font = _font()

    cols = n_words + 1
    cell_h = size + TEXT_BAND + PAD
    cell_w = size + PAD
    canvas = np.full((b * cell_h, cols * cell_w, 3), 255, np.uint8)

    for i in range(b):
        img = to_uint8(np.asarray(images[i]))
        attn = np.asarray(attn_maps[i], np.float32)  # (h, w, T)
        row_y = i * cell_h
        canvas[row_y + TEXT_BAND : row_y + TEXT_BAND + size, :size] = img
        for w_idx in range(n_words):
            word_id = int(captions[i, w_idx])
            if word_id == 0:
                break
            a = attn[:, :, w_idx]
            amax = a.max()
            a = a / amax if amax > 0 else a
            up = _upsample(a, size)
            heat = _colorize(up)
            overlay = (
                0.4 * img.astype(np.float32) + 0.6 * 255.0 * heat
            ).astype(np.uint8)
            x0 = (w_idx + 1) * cell_w
            canvas[row_y + TEXT_BAND : row_y + TEXT_BAND + size, x0 : x0 + size] = overlay
            # word label above the overlay (reference drawCaption)
            strip = Image.fromarray(canvas[row_y : row_y + TEXT_BAND, x0 : x0 + size])
            d = ImageDraw.Draw(strip)
            d.text((2, 2), ixtoword.get(word_id, "<?>"), fill=(0, 0, 0), font=font)
            canvas[row_y : row_y + TEXT_BAND, x0 : x0 + size] = np.asarray(strip)
    return canvas


def build_super_images2(
    images: Sequence[np.ndarray],
    captions: np.ndarray,
    cap_lens: np.ndarray,
    ixtoword: Dict[int, str],
    attn_maps: Sequence[np.ndarray],
    max_vis: int = 8,
) -> np.ndarray:
    """gen_example variant (reference build_super_images2): one block per
    sample with its full caption text, the generated image, and per-word
    overlays for every valid word of *that* caption."""
    b = min(len(captions), max_vis)
    size = images[0].shape[1] if images[0].ndim == 4 else images[0].shape[0]
    blocks: List[np.ndarray] = []
    font = _font()
    for i in range(b):
        img = np.asarray(images[i]) if images[0].ndim == 3 else np.asarray(images[0][i])
        n = int(cap_lens[i])
        attn = np.asarray(attn_maps[i], np.float32)
        words = [ixtoword.get(int(w), "<?>") for w in captions[i][:n]]
        block = build_super_images(
            img[None],
            captions[i : i + 1, :n],
            ixtoword,
            attn[None],
            max_word_num=n,
            max_vis=1,
        )
        # caption text banner
        banner = Image.new("RGB", (block.shape[1], TEXT_BAND), (255, 255, 255))
        d = ImageDraw.Draw(banner)
        d.text((2, 2), " ".join(words), fill=(0, 0, 0), font=font)
        blocks.append(np.concatenate([np.asarray(banner), block], axis=0))
    width = max(bl.shape[1] for bl in blocks)
    padded = [
        np.pad(bl, ((0, 0), (0, width - bl.shape[1]), (0, 0)), constant_values=255)
        for bl in blocks
    ]
    return np.concatenate(padded, axis=0)
