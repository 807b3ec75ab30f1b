"""Host-side image preprocessing with reference parity.

Mirrors the reference transform stack (AttnGAN2/code/main.py:124-129 +
datasets.py:59-88): bbox crop (1.5x box, centered), resize to
``imsize * 76/64``, random crop to imsize, random horizontal flip, per-branch
bilinear downsizes, and [-1, 1] normalization.  PIL is used on the host for
exact parity (SURVEY.md hard-part #7); batches cross to the device once,
already normalized, in NHWC float32.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def bbox_crop(img: Image.Image, bbox: Sequence[int]) -> Image.Image:
    """1.5x bounding-box crop centered on the box (reference get_imgs,
    datasets.py:62-71: r = 0.75 * max(w, h) on each side)."""
    width, height = img.size
    r = int(np.maximum(bbox[2], bbox[3]) * 0.75)
    center_x = int((2 * bbox[0] + bbox[2]) / 2)
    center_y = int((2 * bbox[1] + bbox[3]) / 2)
    y1 = np.maximum(0, center_y - r)
    y2 = np.minimum(height, center_y + r)
    x1 = np.maximum(0, center_x - r)
    x2 = np.minimum(width, center_x + r)
    return img.crop((x1, y1, x2, y2))


def normalize_to_unit(img: Image.Image) -> np.ndarray:
    """ToTensor + Normalize(0.5, 0.5) -> NHWC float32 in [-1, 1]
    (reference TextDataset.norm, datasets.py:96-98)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def train_transform(
    img: Image.Image,
    imsize: int,
    rng: np.random.Generator,
    flip: bool = True,
) -> Image.Image:
    """Resize to imsize*76/64 (bilinear), random crop, random hflip
    (reference main.py:124-129)."""
    target = int(imsize * 76 / 64)
    w, h = img.size
    # torchvision Resize(int): scale the SHORT side to `target`.
    if w <= h:
        new_w, new_h = target, max(1, int(round(target * h / w)))
    else:
        new_w, new_h = max(1, int(round(target * w / h))), target
    img = img.resize((new_w, new_h), Image.BILINEAR)
    x = int(rng.integers(0, new_w - imsize + 1))
    y = int(rng.integers(0, new_h - imsize + 1))
    img = img.crop((x, y, x + imsize, y + imsize))
    if flip and rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


def eval_transform(img: Image.Image, imsize: int) -> Image.Image:
    """Deterministic: short-side resize then center crop."""
    target = int(imsize * 76 / 64)
    w, h = img.size
    if w <= h:
        new_w, new_h = target, max(1, int(round(target * h / w)))
    else:
        new_w, new_h = max(1, int(round(target * w / h))), target
    img = img.resize((new_w, new_h), Image.BILINEAR)
    x = (new_w - imsize) // 2
    y = (new_h - imsize) // 2
    return img.crop((x, y, x + imsize, y + imsize))


def multiscale_branches(
    img: Image.Image, imsizes: Sequence[int]
) -> List[np.ndarray]:
    """Per-branch pyramid: bilinear resize for all but the final branch
    (reference get_imgs, datasets.py:77-88), each normalized to [-1, 1]."""
    out = []
    for i, size in enumerate(imsizes):
        branch = (
            img.resize((size, size), Image.BILINEAR)
            if i < len(imsizes) - 1
            else img
        )
        out.append(normalize_to_unit(branch))
    return out
