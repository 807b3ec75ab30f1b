import glob
import os

import pytest

from sba_gan_tpu.config import cfg_from_dict, cfg_from_file, default_config

PRESET_DIR = os.path.join(os.path.dirname(__file__), "..", "sba_gan_tpu", "configs")


def test_defaults():
    cfg = default_config()
    assert cfg.TREE.BRANCH_NUM == 3
    assert cfg.GAN.GF_DIM == 128
    assert cfg.TRAIN.SMOOTH.GAMMA3 == 10.0
    assert cfg.TEXT.WORDS_NUM == 20


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        cfg_from_dict({"NOT_A_KEY": 1})
    with pytest.raises(KeyError):
        cfg_from_dict({"TRAIN": {"NOPE": 2}})


def test_type_mismatch_raises():
    with pytest.raises(ValueError):
        cfg_from_dict({"TRAIN": {"BATCH_SIZE": "twenty"}})
    with pytest.raises(ValueError):
        cfg_from_dict({"TRAIN": "not-a-dict"})


def test_int_to_float_coercion():
    cfg = cfg_from_dict({"TRAIN": {"SMOOTH": {"GAMMA1": 4}}})
    assert cfg.TRAIN.SMOOTH.GAMMA1 == 4.0
    assert isinstance(cfg.TRAIN.SMOOTH.GAMMA1, float)


def test_all_presets_load():
    presets = glob.glob(os.path.join(PRESET_DIR, "**", "*.yml"), recursive=True)
    assert len(presets) >= 12
    for p in presets:
        cfg = cfg_from_file(p)
        assert cfg.CONFIG_NAME != ""


def test_bird_style_preset_values():
    cfg = cfg_from_file(os.path.join(PRESET_DIR, "bird_style.yml"))
    assert cfg.TRAIN.BATCH_SIZE == 20
    assert cfg.GAN.GF_DIM == 32
    assert cfg.TRAIN.SMOOTH.LAMBDA == 5.0
    assert cfg.TRAIN.SMOOTH.GAMMA1 == 4.0


def test_independent_configs():
    a = default_config()
    b = default_config()
    a.TRAIN.BATCH_SIZE = 7
    assert b.TRAIN.BATCH_SIZE == 64
