"""Inception Score evaluation, TPU-native.

Capability parity with the reference IS notebook
(`AttnGAN2/inception_score.ipynb` cells 1-5, methodology note at
docs/report/report.tex:100): torchvision-style inception_v3 logits ->
softmax -> per-split exp(mean KL(p(y|x) || p(y))).

The classifier is the same Flax Inception-v3 backbone used by the DAMSM
image encoder plus the 1000-way fc head; torchvision weights port in via
sba_gan_tpu.utils.torch_port when a checkpoint file is provided (no network
access is assumed).  Preprocessing matches the notebook: images scaled to
[-1, 1], bilinear-resized to 299 (the notebook goes through torchvision
transforms; up-resize parity is handled by the same align-corners resize the
DAMSM encoder uses, model.py:210).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sba_gan_tpu.models.inception import (
    InceptionV3Backbone,
    resize_bilinear_align_corners,
)


class InceptionV3Classifier(nn.Module):
    """Backbone + 1000-way fc (torchvision inception_v3 head)."""

    num_classes: int = 1000
    input_size: int = 299
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[1] != self.input_size or x.shape[2] != self.input_size:
            x = resize_bilinear_align_corners(x, (self.input_size, self.input_size))
        x = x.astype(self.dtype)
        _, pooled = InceptionV3Backbone(dtype=self.dtype, name="backbone")(x, train)
        logits = nn.Dense(self.num_classes, name="fc")(pooled)
        return logits.astype(jnp.float32)


def make_predict_fn(classifier: nn.Module, variables) -> Callable:
    """Jitted images-in-[-1,1] -> softmax probabilities."""

    @jax.jit
    def predict(imgs):
        logits = classifier.apply(variables, imgs, False)
        return jax.nn.softmax(logits, axis=-1)

    return predict


def inception_score_from_probs(
    probs: np.ndarray, splits: int = 10
) -> Tuple[float, float]:
    """exp(mean KL) per split, mean/std over splits (notebook cell 4)."""
    n = probs.shape[0]
    scores = []
    for k in range(splits):
        part = probs[k * n // splits : (k + 1) * n // splits]
        if part.shape[0] == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))


def batched_apply(
    images: Iterable[np.ndarray], fn: Callable, batch_size: int
) -> np.ndarray:
    """Apply a jitted per-batch fn over an image iterable at a static batch
    shape; the ragged tail is padded by repeating the last image and sliced
    back off (shared by the IS and FID evaluators)."""
    outs = []
    batch = []
    for img in images:
        batch.append(np.asarray(img, np.float32))
        if len(batch) == batch_size:
            outs.append(np.asarray(fn(np.stack(batch))))
            batch = []
    if batch:
        tail = len(batch)
        while len(batch) < batch_size:
            batch.append(batch[-1])
        outs.append(np.asarray(fn(np.stack(batch)))[:tail])
    return np.concatenate(outs, axis=0)


def inception_score(
    images: Iterable[np.ndarray],
    predict_fn: Callable,
    batch_size: int = 32,
    splits: int = 10,
) -> Tuple[float, float]:
    """IS over an iterable of (H, W, 3) images in [-1, 1]."""
    probs = batched_apply(images, predict_fn, batch_size)
    return inception_score_from_probs(probs, splits)


def load_images_from_dir(path: str, size: Optional[int] = None):
    """Yield [-1,1] float images from a directory of PNGs (the notebook's
    ImageFolder over the generated-sample dir)."""
    from PIL import Image

    for name in sorted(os.listdir(path)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        im = Image.open(os.path.join(path, name)).convert("RGB")
        if size is not None:
            im = im.resize((size, size), Image.BILINEAR)
        yield np.asarray(im, np.float32) / 127.5 - 1.0
