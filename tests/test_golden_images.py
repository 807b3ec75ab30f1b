"""Cross-round golden-image regression (VERDICT r3 next-#7).

The strongest parity statement available with zero real weights: a
DETERMINISTIC fabricated torch checkpoint in the reference's exact key
layout (test_reproduce._fabricate_net_g) goes through the real importer
(utils/torch_port.load_torch_state_dict + port_g_net) into the real
sampler (make_sample_fn, EMA branch), and the uint8 PIXELS of every
sampled branch must hash to pinned constants — any numeric drift in the
importer, the text encoder, the generator, or the sampling path fails
this test, not just shape/finiteness changes.

UPDATE PROTOCOL: these hashes pin sampler numerics on the XLA-CPU
backend for the CURRENT jax version.  If they change, first establish
WHY (git bisect the repo change, or a jax/XLA upgrade — check
`jax.__version__` against the pin below).  Only after the cause is
understood and intended, regenerate with

    SBA_GOLDEN_PRINT=1 python -m pytest tests/test_golden_images.py -s

and record the cause in the commit message that updates the constants.
A drift you cannot explain is a real importer/sampler regression.
"""

import hashlib
import os

import jax
import numpy as np
import pytest

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.train import build_models, init_gan_state, make_sample_fn
from sba_gan_tpu.utils.image import to_uint8

from test_reproduce import TINY, _fabricate_net_g

# jax version the hashes were generated under (see module docstring)
PINNED_JAX = "0.9.0"
GOLDEN = {
    "branch0": "35c355c17319837bd02a6eef6c34ea7f2a621e2fdf47c68716851d918e8a61aa",
    "branch1": "2443d6ae98bde13a0356a5521b8c091dc689a2b564b164e68681c64cefce1cc1",
}


def _sample_hashes(tmp_path) -> dict:
    from sba_gan_tpu.utils.torch_port import (
        load_torch_state_dict,
        port_g_net,
    )

    net_g = os.path.join(str(tmp_path), "netG_epoch_600.pth")
    _fabricate_net_g(net_g)
    params, batch_stats = port_g_net(load_torch_state_dict(net_g))

    cfg = cfg_from_dict(TINY)
    models = build_models(cfg, 30)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    state = state.replace(
        g=state.g.replace(batch_stats=batch_stats), g_ema=params
    )
    sample = make_sample_fn(cfg, models)  # EMA branch = imported params

    t = cfg.TEXT.WORDS_NUM
    captions = np.zeros((2, t), np.int32)
    captions[0, :4] = [3, 7, 11, 2]
    captions[1, :3] = [5, 1, 9]
    cap_lens = np.array([4, 3], np.int32)
    fakes, atts = sample(state, np.asarray(captions), cap_lens,
                         jax.random.PRNGKey(42))
    return {
        f"branch{i}": hashlib.sha256(
            np.ascontiguousarray(to_uint8(np.asarray(f))).tobytes()
        ).hexdigest()
        for i, f in enumerate(fakes)
    }


def test_golden_sample_hashes(tmp_path):
    pytest.importorskip("torch")
    if jax.devices()[0].platform != "cpu":
        pytest.skip("hashes pinned on the XLA-CPU backend")
    got = _sample_hashes(tmp_path)
    if os.environ.get("SBA_GOLDEN_PRINT"):
        print("\nGOLDEN = {")
        for k, v in got.items():
            print(f'    "{k}": "{v}",')
        print("}")
        print(f'PINNED_JAX = "{jax.__version__}"')
    if jax.__version__ != PINNED_JAX and got != GOLDEN:
        # Toolchain drift, not a repo regression: report it LOUDLY as an
        # expected failure with the update protocol (VERDICT r4 #10 — a
        # version bump must never silently invalidate the pin), instead
        # of failing identically to a same-version numeric regression.
        pytest.xfail(
            f"golden hashes pinned under jax {PINNED_JAX} but running "
            f"{jax.__version__}: regenerate via SBA_GOLDEN_PRINT=1 per the "
            f"module docstring and move the pin in the same commit"
        )
    assert got == GOLDEN, (
        f"sampled-image hashes drifted under the SAME jax version "
        f"({jax.__version__}) — a real importer/sampler regression.\n"
        f"got: {got}\nexpected: {GOLDEN}"
    )
