"""Multi-resolution pack pipeline tests (SURVEY.md L6)."""

import os

import numpy as np
import pytest
from PIL import Image

from sba_gan_tpu.data.multires import (
    MultiResolutionDataset,
    PackReader,
    PackWriter,
    TextOnlyDataset,
    batch_iterator,
    build_multires,
    resize_and_convert,
)


def _mini_tree(tmp_path, n=4, captions_per=6):
    """birds-style class-subdir image tree + caption tree."""
    rng = np.random.default_rng(0)
    img_root = tmp_path / "images"
    txt_root = tmp_path / "text"
    for i in range(n):
        cls = f"{i % 2:03d}.class"
        (img_root / cls).mkdir(parents=True, exist_ok=True)
        (txt_root / cls).mkdir(parents=True, exist_ok=True)
        arr = rng.integers(0, 255, (40, 56, 3), np.uint8)
        Image.fromarray(arr).save(img_root / cls / f"img_{i}.jpg")
        caps = "\n".join(f"a bird number {i} caption {k}"
                         for k in range(captions_per))
        (txt_root / cls / f"img_{i}.txt").write_text(caps + "\n")
    return str(img_root), str(txt_root)


def test_pack_roundtrip(tmp_path):
    path = str(tmp_path / "pack")
    with PackWriter(path) as w:
        w.put("a", b"hello")
        w.put("b", b"world!")
    r = PackReader(path)
    assert r.get("a") == b"hello"
    assert r.get("b") == b"world!"
    assert r.get("missing") is None


def test_resize_and_convert_square():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (30, 50, 3), np.uint8))
    data = resize_and_convert(img, 16)
    out = Image.open(__import__("io").BytesIO(data))
    assert out.size == (16, 16)
    assert out.format == "JPEG"


def test_build_and_read_multires(tmp_path):
    img_path, txt_path = _mini_tree(tmp_path)
    out = str(tmp_path / "pack")
    total = build_multires(img_path, txt_path, out, sizes=(4, 8, 16),
                           n_worker=1)
    assert total == 4
    ds = MultiResolutionDataset(out, resolution=8, max_length=12, seed=0,
                                flip=False)
    assert len(ds) == 4
    img, tokens = ds[0]
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.float32
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert tokens.shape == (12,)
    assert tokens.dtype == np.int32
    assert np.any(tokens != 0)


def test_multires_rung_switch(tmp_path):
    img_path, txt_path = _mini_tree(tmp_path, n=2)
    out = str(tmp_path / "pack")
    build_multires(img_path, txt_path, out, sizes=(4, 16), n_worker=1)
    for res in (4, 16):
        ds = MultiResolutionDataset(out, resolution=res, seed=0)
        assert ds[1][0].shape == (res, res, 3)
    ds = MultiResolutionDataset(out, resolution=8, seed=0)
    with pytest.raises(KeyError):
        ds[0]


def test_text_only_dataset(tmp_path):
    img_path, txt_path = _mini_tree(tmp_path, n=2)
    out = str(tmp_path / "pack")
    build_multires(img_path, txt_path, out, sizes=(4,), n_worker=1)
    ds = TextOnlyDataset(out, max_length=10, seed=0)
    assert len(ds) == 2
    toks = ds[0]
    assert toks.shape == (10,)
    assert np.any(toks != 0)


def test_batch_iterator_shapes(tmp_path):
    img_path, txt_path = _mini_tree(tmp_path)
    out = str(tmp_path / "pack")
    build_multires(img_path, txt_path, out, sizes=(8,), n_worker=1)
    ds = MultiResolutionDataset(out, resolution=8, max_length=6, seed=0)
    batches = list(batch_iterator(ds, batch_size=2, seed=0))
    assert len(batches) == 2
    imgs, toks = batches[0]
    assert imgs.shape == (2, 8, 8, 3)
    assert toks.shape == (2, 6)


def test_prepare_data_cli(tmp_path, monkeypatch, capsys):
    img_path, txt_path = _mini_tree(tmp_path, n=2)
    out = str(tmp_path / "pack")
    import sys

    from sba_gan_tpu.prepare_data import main

    monkeypatch.setattr(sys, "argv", [
        "prepare_data", "--out", out, "--img_path", img_path,
        "--txt_path", txt_path, "--n_worker", "1", "--sizes", "4", "8",
    ])
    main()
    assert "Total samples: 2" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out, "pack.idx"))
