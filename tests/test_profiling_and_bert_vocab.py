"""StepTimer/profiling hooks + BERT caption-cache tests."""

import os
import pickle
import time

import numpy as np
import pytest

from sba_gan_tpu.utils.profiling import StepTimer, annotate


def test_step_timer_ms_and_loss_line():
    t = StepTimer(window=10)
    t.tick()
    time.sleep(0.01)
    t.tick()
    assert t.ms_per_batch >= 10.0
    line = t.loss_line(5, {"errG": 1.2345}, batch_size=8)
    assert "step 5" in line and "errG: 1.234" in line and "img/s" in line


def test_annotate_context():
    with annotate("test-phase"):
        pass  # must not raise


def test_bert_caption_cache_roundtrip(tmp_path):
    """A pre-built captions_bert.pickle loads without the tokenizer
    (reference cache layout, datasets_bert.py:224)."""
    from sba_gan_tpu.data.vocab import load_or_build_captions_bert

    cache = [
        [[5, 6, 7]], [[8, 9]],
        {5: "a", 6: "bird", 7: "sits", 8: "red", 9: "wing"},
        {"a": 5, "bird": 6, "sits": 7, "red": 8, "wing": 9},
    ]
    with open(tmp_path / "captions_bert.pickle", "wb") as f:
        pickle.dump(cache, f)
    tr, te, ix, wi = load_or_build_captions_bert(str(tmp_path), [], [], 10)
    assert tr == [[5, 6, 7]] and te == [[8, 9]]
    assert ix[6] == "bird" and wi["bird"] == 6


def test_bert_vocab_build_requires_tokenizer(tmp_path):
    """Without a cache or a local tokenizer the build fails loudly."""
    from sba_gan_tpu.data.vocab import load_or_build_captions_bert

    with pytest.raises(RuntimeError, match="tokenizer"):
        load_or_build_captions_bert(str(tmp_path), [], [], 10)
