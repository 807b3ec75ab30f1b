"""End-to-end torch-checkpoint import through GANTrainer.load_torch_weights:
fabricate reference-layout .pth files, import, and sample."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.data.cub import SyntheticDataset
from sba_gan_tpu.train.loop import GANTrainer

N_WORDS = 30


def tiny_cfg(tmp):
    return cfg_from_dict(
        {
            "WORKERS": 0,
            "TREE": {"BRANCH_NUM": 2},
            "TRAIN": {"BATCH_SIZE": 4},
            "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 8, "W_DIM": 16,
                    "CONDITION_DIM": 8, "R_NUM": 1},
            "TEXT": {"EMBEDDING_DIM": 32, "WORDS_NUM": 6},
            "MODEL": {"INCEPTION_INPUT": 75},
        }
    )


def test_import_text_encoder_pth(tmp_path):
    """A reference-layout RNN_ENCODER .pth loads and changes the text
    encoder's outputs."""
    cfg = tiny_cfg(tmp_path)
    ds = SyntheticDataset(num_examples=8, branch_num=2, words_num=6,
                          n_words=N_WORDS)
    tr = GANTrainer(cfg, str(tmp_path), ds, N_WORDS, ds.ixtoword)

    torch.manual_seed(0)
    h = 16  # nhidden/2
    sd = {"encoder.weight": torch.randn(N_WORDS, 300)}
    for suffix in ("l0", "l0_reverse"):
        sd[f"rnn.weight_ih_{suffix}"] = torch.randn(4 * h, 300)
        sd[f"rnn.weight_hh_{suffix}"] = torch.randn(4 * h, h)
        sd[f"rnn.bias_ih_{suffix}"] = torch.randn(4 * h)
        sd[f"rnn.bias_hh_{suffix}"] = torch.randn(4 * h)
    path = str(tmp_path / "text_encoder200.pth")
    torch.save(sd, path)

    old_emb = np.asarray(
        jax.tree.leaves(tr.state.text)[0]
    ).copy()
    tr.load_torch_weights(net_e_text=path)
    emb = np.asarray(tr.state.text["params"]["embedding"])
    assert emb.shape == (N_WORDS, 300)
    np.testing.assert_allclose(emb, sd["encoder.weight"].numpy(), atol=1e-6)

    # the trainer still samples after the import
    caps = np.zeros((2, 6), np.int32)
    caps[:, :3] = [[3, 5, 7], [2, 4, 6]]
    fakes, _ = tr.sample_fn(tr.state, caps, np.array([3, 3], np.int32),
                            jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(fakes[-1])).all()
