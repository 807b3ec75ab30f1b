"""Trainer-orchestration tests: one epoch on synthetic data, checkpoint
round-trip, sampling output files, gen_example artifacts, viz shapes."""

import os

import jax
import numpy as np
import pytest

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.data.cub import SyntheticDataset
from sba_gan_tpu.train.loop import GANTrainer
from sba_gan_tpu.utils.image import make_grid, to_uint8
from sba_gan_tpu.utils.viz import build_super_images

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')

N_WORDS = 40


def tiny_cfg(tmp):
    return cfg_from_dict(
        {
            "DATA_DIR": str(tmp),
            "WORKERS": 0,
            "TREE": {"BRANCH_NUM": 2, "BASE_SIZE": 64},
            "TRAIN": {"BATCH_SIZE": 8, "MAX_EPOCH": 1, "SNAPSHOT_INTERVAL": 1},
            "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 8, "W_DIM": 16,
                    "CONDITION_DIM": 8, "R_NUM": 1},
            "TEXT": {"EMBEDDING_DIM": 32, "WORDS_NUM": 6},
            "MODEL": {"INCEPTION_INPUT": 75},
        }
    )


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gan_out")
    cfg = tiny_cfg(tmp)
    ds = SyntheticDataset(
        num_examples=16, branch_num=2, words_num=6, n_words=N_WORDS
    )
    return GANTrainer(cfg, str(tmp), ds, N_WORDS, ds.ixtoword,
                      log_every=1, image_every=2)


def test_one_epoch_and_snapshot(trainer):
    trainer.train(max_epoch=1)
    assert int(trainer.state.step) == 2  # 16 examples / batch 8
    assert trainer.ckpt.latest_step() == 0
    # attention grid dumped at step 2
    assert os.path.exists(os.path.join(trainer.image_dir, "attn_2.png"))


def test_checkpoint_roundtrip(trainer):
    restored = trainer.ckpt.restore(trainer.state)
    a = jax.tree.leaves(trainer.state.g.params)
    b = jax.tree.leaves(restored.g.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    # resume() picks up the latest snapshot
    assert trainer.resume()
    assert trainer.start_epoch == 1


def test_sampling_writes_pngs(trainer):
    out = trainer.sampling("valid")
    files = os.listdir(out)
    assert len(files) == 16
    assert all(f.endswith("_s-1.png") for f in files)


def test_gen_example(trainer):
    caps = np.zeros((2, 6), np.int32)
    caps[0, :4] = [3, 5, 7, 9]
    caps[1, :3] = [2, 4, 6]
    data_dic = {"cap0": (caps, np.array([4, 3], np.int32), None)}
    root = trainer.gen_example(data_dic)
    files = os.listdir(os.path.join(root, "cap0"))
    # 2 captions x 2 stages + attention grid
    assert len([f for f in files if f.endswith(".png")]) == 5
    assert "attention_maps.png" in files


def test_gen_example_mixing_variants(tmp_path):
    cfg = tiny_cfg(tmp_path)
    cfg.TRAIN.MIXING = True
    cfg.GAN.INIT_Z_CONCAT = False
    ds = SyntheticDataset(num_examples=8, branch_num=2, words_num=6,
                          n_words=N_WORDS)
    tr = GANTrainer(cfg, str(tmp_path), ds, N_WORDS, ds.ixtoword)
    caps = np.zeros((2, 6), np.int32)
    caps[:, :3] = [[3, 5, 7], [2, 4, 6]]
    root = tr.gen_example({"mix0": (caps, np.array([3, 3], np.int32), None)})
    files = os.listdir(os.path.join(root, "mix0"))
    for tag in ("AB", "BA", "A", "B"):
        assert f"0_mix_{tag}.png" in files, files
        assert f"1_mix_{tag}.png" in files


def test_build_super_images_shape():
    """Reference layout (miscc/utils.py:54-176): per sample a
    [FONT_MAX caption band / raw-map row / overlay row] block; columns =
    image, max-over-words, then one per word."""
    from sba_gan_tpu.utils.viz import FONT_MAX, PAD

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    caps = np.zeros((3, 5), np.int64)
    caps[:, :3] = rng.integers(1, 10, (3, 3))
    attn = rng.uniform(0, 1, (3, 8, 8, 5)).astype(np.float32)
    grid = build_super_images(imgs, caps, {i: f"w{i}" for i in range(10)}, attn)
    assert grid.dtype == np.uint8
    assert grid.shape[0] == 3 * (FONT_MAX + 2 * 64)
    assert grid.shape[1] == (5 + 2) * (64 + PAD)


def test_build_super_images_word_colors():
    """Caption bands carry the reference per-word palette (COLOR_DIC)."""
    from sba_gan_tpu.utils.viz import COLOR_DIC, PAD

    rng = np.random.default_rng(1)
    imgs = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    caps = np.zeros((1, 4), np.int64)
    caps[0, :2] = [3, 5]
    attn = rng.uniform(0, 1, (1, 4, 4, 4)).astype(np.float32)
    grid = build_super_images(imgs, caps, {i: f"w{i}" for i in range(10)},
                              attn)
    cell_w = 32 + PAD
    # word 0's band cell (column 2) is COLOR_DIC[0] at its corner pixel
    assert tuple(grid[0, 2 * cell_w + cell_w - 1]) == tuple(COLOR_DIC[0])
    assert tuple(grid[0, 3 * cell_w + cell_w - 1]) == tuple(COLOR_DIC[1])


def test_build_super_images2_topk_layout():
    from sba_gan_tpu.utils.viz import FONT_MAX, PAD, build_super_images2

    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    caps = np.zeros((2, 8), np.int64)
    caps[:, :7] = rng.integers(1, 10, (2, 7))
    lens = np.array([7, 3], np.int32)
    attn = rng.uniform(0, 1, (2, 4, 4, 8)).astype(np.float32)
    grid = build_super_images2(imgs, caps, lens,
                               {i: f"w{i}" for i in range(10)}, attn)
    assert grid.dtype == np.uint8
    # two [band/overlay] blocks; width = top-5 columns (sample 0 caps at 5)
    assert grid.shape[0] == 2 * (FONT_MAX + 32)
    assert grid.shape[1] == 5 * (32 + PAD)


def test_gaussian_smoothing_flattens_peaks():
    from sba_gan_tpu.utils.viz import _smooth_upsample

    a = np.zeros((4, 4), np.float32)
    a[1, 1] = 1.0
    up = _smooth_upsample(a, 64, sigma=20.0)
    assert up.shape == (64, 64)
    # sigma-20 smoothing spreads the impulse: peak far below 1, mass kept
    assert up.max() < 0.2
    assert up.min() > -1e-3


def test_make_grid_and_uint8():
    imgs = [np.full((4, 4, 3), -1.0), np.full((4, 4, 3), 1.0)]
    g = make_grid(imgs, nrow=2)
    assert g.dtype == np.uint8
    assert to_uint8(np.array([[-1.0]]))[0, 0] == 0
    assert to_uint8(np.array([[1.0]]))[0, 0] == 255


def test_png_bytes_roundtrip_and_fallback():
    """Minimal PNG encoder (utils/image.png_bytes): PIL must read back the
    exact pixels for RGB8, and non-RGB input must fall through to PIL."""
    import io as _io

    from PIL import Image as _Image

    from sba_gan_tpu.utils.image import png_bytes

    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    back = np.asarray(_Image.open(_io.BytesIO(png_bytes(a))))
    np.testing.assert_array_equal(back, a)
    gray = rng.integers(0, 255, (16, 16), dtype=np.uint8)  # PIL fallback
    back = np.asarray(_Image.open(_io.BytesIO(png_bytes(gray))))
    np.testing.assert_array_equal(back, gray)
