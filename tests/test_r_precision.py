"""R-precision metric tests (pure numpy; no jit).

The metric is a framework extension over the reference (which scores IS
only); these tests pin the protocol: candidate pools of 1 true + K-1
mismatched captions, top-r success by cosine similarity of DAMSM codes.
"""

import numpy as np
import pytest

from sba_gan_tpu.evaluation.r_precision import r_precision_from_codes


def test_perfectly_aligned_codes_score_one():
    """Distinct one-hot-ish pairs: the true caption always wins."""
    rng = np.random.default_rng(0)
    n, d = 40, 16
    codes = rng.standard_normal((n, d)).astype(np.float32)
    mean, std = r_precision_from_codes(
        codes, codes, np.random.default_rng(1), num_candidates=10, trials=2)
    assert mean == 1.0 and std == 0.0


def test_random_codes_score_near_chance():
    """Unrelated codes: top-1 of a 20-pool succeeds ~1/20 of the time."""
    rng = np.random.default_rng(2)
    n, d = 400, 32
    img = rng.standard_normal((n, d))
    sent = rng.standard_normal((n, d))
    mean, _ = r_precision_from_codes(
        img, sent, np.random.default_rng(3), num_candidates=20, trials=4)
    assert 0.0 < mean < 0.15  # chance = 0.05


def test_top_r_monotone_and_bounded():
    rng = np.random.default_rng(4)
    n, d = 200, 8
    img = rng.standard_normal((n, d))
    sent = img + 0.5 * rng.standard_normal((n, d))
    kw = dict(num_candidates=25, trials=2)
    m1, _ = r_precision_from_codes(img, sent, np.random.default_rng(5), r=1, **kw)
    m5, _ = r_precision_from_codes(img, sent, np.random.default_rng(5), r=5, **kw)
    assert 0.0 <= m1 <= m5 <= 1.0
    assert m1 > 0.2  # correlated codes beat chance (0.04) comfortably


def test_class_mask_excludes_same_class_candidates():
    """With every mismatch drawn from the query's class excluded, a code
    space that confuses only same-class captions scores perfectly."""
    rng = np.random.default_rng(6)
    n, d = 60, 12
    cls = np.repeat(np.arange(12), 5)
    # class-mean embedding + tiny noise: same-class captions are nearly
    # indistinguishable, cross-class ones are far away
    centers = rng.standard_normal((12, d)) * 10.0
    sent = centers[cls] + 0.01 * rng.standard_normal((n, d))
    img = centers[cls] + 0.01 * rng.standard_normal((n, d))
    masked, _ = r_precision_from_codes(
        img, sent, np.random.default_rng(7), num_candidates=20,
        trials=2, class_ids=cls)
    assert masked == 1.0


def test_errors_on_bad_shapes():
    rng = np.random.default_rng(8)
    codes = rng.standard_normal((30, 4))
    with pytest.raises(ValueError):
        r_precision_from_codes(codes, codes[:10], np.random.default_rng(0))
    with pytest.raises(ValueError):
        r_precision_from_codes(codes, codes, np.random.default_rng(0),
                               num_candidates=100)
