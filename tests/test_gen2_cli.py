"""Gen-2 CLI end-to-end smoke (SURVEY.md L8-L9): synthetic data and a
multi-resolution pack, tiny dims."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

from sba_gan_tpu.data.multires import build_multires

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')

TINY_YML = """
CONFIG_NAME: "gen2_tiny"
GEN2:
  E_DIM: 8
  C_DIM: 6
  Z_DIM: 5
  W_DIM: 12
  A_DIM: 10
  MAX_LENGTH: 6
  M_LAYERS: 2
  RESOLUTION: 8
  RESOLUTION_INIT: 4
  FMAP_BASE: 64
  FMAP_MAX: 16
  WGAN: true
  BERT_VOCAB: 60
  BERT_HIDDEN: 16
  BERT_LAYERS: 1
  BERT_HEADS: 2
  BERT_INTERMEDIATE: 32
TRAIN:
  BATCH_SIZE: 2
  MAX_EPOCH: 1
  CRITIC_ITER: 2
  SNAPSHOT_INTERVAL: 50
"""


def _run_cli(argv, monkeypatch):
    from sba_gan_tpu.gen2_main import main

    monkeypatch.setattr(sys, "argv", argv)
    main()


def test_gen2_cli_synthetic(tmp_path, monkeypatch, capsys):
    cfg = tmp_path / "tiny.yml"
    cfg.write_text(TINY_YML)
    out = str(tmp_path / "out")
    _run_cli(["gen2_main", "--cfg", str(cfg), "--synthetic",
              "--output_dir", out], monkeypatch)
    printed = capsys.readouterr().out
    assert "Loss_D" in printed and "nan" not in printed
    assert os.path.exists(os.path.join(out, "Image", "epoch_0.png"))


def test_gen2_cli_pack(tmp_path, monkeypatch, capsys):
    rng = np.random.default_rng(0)
    for i in range(3):
        (tmp_path / "images" / "c").mkdir(parents=True, exist_ok=True)
        (tmp_path / "text" / "c").mkdir(parents=True, exist_ok=True)
        Image.fromarray(
            rng.integers(0, 255, (24, 30, 3), np.uint8)
        ).save(tmp_path / "images" / "c" / f"i{i}.jpg")
        (tmp_path / "text" / "c" / f"i{i}.txt").write_text(
            "\n".join(f"bird {i} cap {k}" for k in range(6)) + "\n")
    pack = str(tmp_path / "pack")
    build_multires(str(tmp_path / "images"), str(tmp_path / "text"), pack,
                   sizes=(4, 8), n_worker=1)

    cfg = tmp_path / "tiny.yml"
    cfg.write_text(TINY_YML)
    out = str(tmp_path / "out_pack")
    _run_cli(["gen2_main", "--cfg", str(cfg), "--data_dir", pack,
              "--output_dir", out], monkeypatch)
    printed = capsys.readouterr().out
    assert "Loss_D" in printed and "nan" not in printed
