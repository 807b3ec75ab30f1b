"""Free-text caption ingest tests (reference gen_example ingest,
main.py:34-83): example_filenames.txt -> per-file sentences -> padded ids."""

import os

import numpy as np

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.data.vocab import encode_free_text, tokenize_caption
from sba_gan_tpu.main import load_example_captions


def test_tokenize_matches_regexp():
    assert tokenize_caption("A small, RED bird!") == ["a", "small", "red", "bird"]
    assert tokenize_caption("café bird") == ["caf", "bird"]  # ascii filter


def test_encode_free_text_pads_and_clips():
    wordtoix = {"a": 1, "bird": 2, "red": 3}
    ids, lens = encode_free_text(
        ["a red bird", "bird unknownword", "a a a a a"], wordtoix, words_num=4
    )
    assert ids.shape == (3, 4)
    np.testing.assert_array_equal(ids[0], [1, 3, 2, 0])
    np.testing.assert_array_equal(lens, [3, 1, 4])  # unknown dropped; clipped


def test_load_example_captions(tmp_path):
    os.makedirs(tmp_path / "text")
    (tmp_path / "example_filenames.txt").write_text("text/example_captions\n")
    (tmp_path / "text" / "example_captions.txt").write_text(
        "a red bird\nbird a\n"
    )
    cfg = cfg_from_dict({"DATA_DIR": str(tmp_path), "TEXT": {"WORDS_NUM": 5}})
    data_dic = load_example_captions(cfg, {"a": 1, "bird": 2, "red": 3})
    ids, lens, _ = data_dic["example_captions"]
    assert ids.shape == (2, 5)
    np.testing.assert_array_equal(lens, [3, 2])
