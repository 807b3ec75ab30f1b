"""CUB-200-2011 (and generic COCO-style) caption/image dataset.

Capability parity with the reference TextDataset
(AttnGAN2/code/datasets.py:91-322): filenames/class pickles, bounding-box
metadata, caption cache, per-item random 1-of-N caption selection, bbox crop,
multiscale branch images, and zero-padded captions.

TPU-first deviation (SURVEY.md build plan §1): no sort-by-length anywhere —
batches keep input order at static shape and carry explicit lengths, so the
jitted step never sees data-dependent shapes.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from sba_gan_tpu.data import transforms as T
from sba_gan_tpu.data.vocab import load_or_build_captions, pad_caption


def load_filenames(data_dir: str, split: str) -> List[str]:
    """(reference load_filenames, datasets.py:269-277)"""
    filepath = os.path.join(data_dir, split, "filenames.pickle")
    if os.path.isfile(filepath):
        with open(filepath, "rb") as f:
            return pickle.load(f)
    return []


def load_class_ids(split_dir: str, total_num: int) -> np.ndarray:
    """(reference load_class_id, datasets.py:261-266)"""
    path = os.path.join(split_dir, "class_info.pickle")
    if os.path.isfile(path):
        with open(path, "rb") as f:
            return np.asarray(pickle.load(f, encoding="latin1"))
    return np.arange(total_num)


def load_bboxes(data_dir: str) -> Optional[Dict[str, List[int]]]:
    """CUB bounding boxes keyed by image stem (reference load_bbox,
    datasets.py:121-143)."""
    base = os.path.join(data_dir, "CUB_200_2011", "CUB_200_2011")
    bbox_path = os.path.join(base, "bounding_boxes.txt")
    images_path = os.path.join(base, "images.txt")
    if not (os.path.isfile(bbox_path) and os.path.isfile(images_path)):
        return None
    out: Dict[str, List[int]] = {}
    with open(images_path) as f:
        names = [line.split()[1] for line in f if line.strip()]
    with open(bbox_path) as f:
        for line, name in zip(f, names):
            parts = line.split()
            out[name[:-4]] = [int(float(v)) for v in parts[1:5]]
    return out


class TextImageDataset:
    """Map-style dataset of (branch images, caption ids, caption length,
    class id, key)."""

    def __init__(
        self,
        data_dir: str,
        split: str = "train",
        base_size: int = 64,
        branch_num: int = 3,
        words_num: int = 20,
        captions_per_image: int = 10,
        b_dcgan: bool = False,
        seed: int = 0,
        vocab: str = "word",  # 'word' (datasets.py) | 'bert' (datasets_bert.py)
        loader: str = "pil",  # 'pil' (parity) | 'native' (C++ speed path)
    ):
        self.data_dir = data_dir
        self._native = None
        if loader == "native":
            from sba_gan_tpu.data.native_loader import NativeImageLoader

            if NativeImageLoader.available():
                self._native = NativeImageLoader()
        self.split = split
        self.branch_num = branch_num
        self.words_num = words_num
        self.embeddings_num = captions_per_image
        self.b_dcgan = b_dcgan
        # augmentation randomness is derived per (seed, epoch, index) in
        # __getitem__ — no shared RNG state, so N-worker fetches are
        # thread-safe and deterministic regardless of completion order
        # (the torch DataLoader gets this from per-worker seeding,
        # AttnGAN2/code/main.py:131-133).
        self._seed = seed
        self._epoch = 0
        self.train_mode = split == "train"

        self.imsize = [base_size * (2 ** i) for i in range(branch_num)]

        self.bbox = load_bboxes(data_dir) if "birds" in data_dir else None
        train_names = load_filenames(data_dir, "train")
        test_names = load_filenames(data_dir, "test")
        if vocab == "bert":
            from sba_gan_tpu.data.vocab import load_or_build_captions_bert

            train_caps, test_caps, self.ixtoword, self.wordtoix = (
                load_or_build_captions_bert(
                    data_dir, train_names, test_names, captions_per_image
                )
            )
        else:
            train_caps, test_caps, self.ixtoword, self.wordtoix = (
                load_or_build_captions(
                    data_dir, train_names, test_names, captions_per_image
                )
            )
        self.n_words = len(self.ixtoword)
        if split == "train":
            self.filenames, self.captions = train_names, train_caps
        else:
            self.filenames, self.captions = test_names, test_caps
        self.class_id = load_class_ids(
            os.path.join(data_dir, split), len(self.filenames)
        )

    def __len__(self):
        return len(self.filenames)

    def set_epoch(self, epoch: int) -> None:
        """Advance the per-epoch augmentation stream (called by DataLoader)."""
        self._epoch = int(epoch)

    def _item_rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng([self._seed, self._epoch, index])

    def _image_path(self, key: str) -> str:
        if self.bbox is not None:
            return os.path.join(
                self.data_dir, "CUB_200_2011", "CUB_200_2011", "images", key + ".jpg"
            )
        return os.path.join(self.data_dir, "images", key + ".jpg")

    def _load_native(self, key: str, rng: np.random.Generator):
        """Speed-mode pixel path: geometry computed here, decode/crop/resize
        in C++ (sba_gan_tpu/native/sba_loader.cpp)."""
        path = self._image_path(key)
        with Image.open(path) as im:
            w, h = im.size  # header-only read
        bbox_rect = None
        if self.bbox is not None:
            bx, by, bw, bh = self.bbox[key]
            r = int(max(bw, bh) * 0.75)
            cx, cy = int((2 * bx + bw) / 2), int((2 * by + bh) / 2)
            x1, y1 = max(0, cx - r), max(0, cy - r)
            x2, y2 = min(w, cx + r), min(h, cy + r)
            bbox_rect = (x1, y1, x2 - x1, y2 - y1)
            w, h = x2 - x1, y2 - y1
        final = self.imsize[-1]
        target = int(final * 76 / 64)
        if w <= h:
            new_w, new_h = target, max(1, int(round(target * h / w)))
        else:
            new_w, new_h = max(1, int(round(target * w / h))), target
        if self.train_mode:
            x = int(rng.integers(0, new_w - final + 1))
            y = int(rng.integers(0, new_h - final + 1))
            hflip = bool(rng.random() < 0.5)
        else:
            x, y = (new_w - final) // 2, (new_h - final) // 2
            hflip = False
        sizes = [final] if self.b_dcgan else list(self.imsize)
        return self._native.load(
            path, sizes=sizes, bbox=bbox_rect, pre_size=(new_w, new_h),
            crop2=(x, y, final, final), hflip=hflip,
        )

    def __getitem__(self, index: int):
        key = self.filenames[index]
        path = self._image_path(key)
        rng = self._item_rng(index)
        if self._native is not None and path.lower().endswith((".jpg", ".jpeg")):
            imgs = self._load_native(key, rng)
        else:
            img = Image.open(path).convert("RGB")
            if self.bbox is not None:
                img = T.bbox_crop(img, self.bbox[key])
            final_size = self.imsize[-1]
            if self.train_mode:
                img = T.train_transform(img, final_size, rng)
            else:
                img = T.eval_transform(img, final_size)
            if self.b_dcgan:
                imgs = [T.normalize_to_unit(img)]
            else:
                imgs = T.multiscale_branches(img, self.imsize)

        # random 1-of-N caption (reference __getitem__, datasets.py:314-317)
        sent_ix = int(rng.integers(0, self.embeddings_num))
        new_sent_ix = index * self.embeddings_num + sent_ix
        caps, cap_len = pad_caption(
            self.captions[new_sent_ix], self.words_num, rng
        )
        return imgs, caps, cap_len, int(self.class_id[index]), key


class SyntheticDataset:
    """Deterministic stand-in with the TextImageDataset interface — the
    frozen-batch fixture strategy the reference used via testcase.npy
    (SURVEY.md §4), generated instead of dumped."""

    def __init__(
        self,
        num_examples: int = 64,
        base_size: int = 64,
        branch_num: int = 3,
        words_num: int = 20,
        n_words: int = 300,
        num_classes: int = 20,
        b_dcgan: bool = False,
        seed: int = 0,
    ):
        self.num_examples = num_examples
        self.branch_num = branch_num
        self.words_num = words_num
        self.n_words = n_words
        self.b_dcgan = b_dcgan
        self.imsize = [base_size * (2 ** i) for i in range(branch_num)]
        self.ixtoword = {i: f"w{i}" for i in range(n_words)}
        self.ixtoword[0] = "<end>"
        self.wordtoix = {v: k for k, v in self.ixtoword.items()}
        rng = np.random.default_rng(seed)
        self.class_id = rng.integers(0, num_classes, size=num_examples)
        self.filenames = [f"synthetic/{i:05d}" for i in range(num_examples)]
        self._seed = seed

    def __len__(self):
        return self.num_examples

    def __getitem__(self, index: int):
        rng = np.random.default_rng(self._seed * 100003 + index)
        sizes = self.imsize[-1:] if self.b_dcgan else self.imsize
        imgs = [
            rng.uniform(-1, 1, size=(s, s, 3)).astype(np.float32) for s in sizes
        ]
        cap_len = int(rng.integers(4, self.words_num + 1))
        caps = np.zeros((self.words_num,), dtype=np.int64)
        caps[:cap_len] = rng.integers(1, self.n_words, size=cap_len)
        return imgs, caps, cap_len, int(self.class_id[index]), self.filenames[index]
