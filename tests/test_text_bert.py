"""BertEncoder tests: shapes/masking, freeze mask, HF weight-port parity
against transformers' torch BertModel (random weights — no network)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.models.text_bert import (
    BERT_BASE,
    BertEncoder,
    bert_trainable_mask,
    port_bert,
)

TINY = dict(
    vocab_size=50,
    hidden_size=16,
    num_layers=2,
    num_heads=2,
    intermediate_size=32,
    max_position=24,
    type_vocab_size=2,
    layer_norm_eps=1e-12,
)


def test_shapes_and_pad_zeroing():
    enc = BertEncoder(nef=8, bert_cfg=TINY)
    b, t = 3, 7
    captions = jnp.ones((b, t), jnp.int32)
    cap_lens = jnp.array([7, 4, 2], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), captions, cap_lens, train=False)
    words, sent = enc.apply(variables, captions, cap_lens, train=False)
    assert words.shape == (b, t, 8)
    assert sent.shape == (b, 8)
    np.testing.assert_array_equal(np.asarray(words[1, 4:]), 0.0)
    np.testing.assert_array_equal(np.asarray(words[2, 2:]), 0.0)
    assert np.any(np.asarray(words[0]) != 0.0)


def test_trainable_mask():
    enc = BertEncoder(nef=8, bert_cfg=TINY)
    variables = enc.init(
        jax.random.PRNGKey(0),
        jnp.ones((2, 5), jnp.int32),
        jnp.array([5, 3], jnp.int32),
        train=False,
    )
    mask = bert_trainable_mask(variables["params"])
    assert all(jax.tree.leaves(mask["emb_words"]))
    assert all(jax.tree.leaves(mask["emb_sent"]))
    assert all(jax.tree.leaves(mask["bert"]["pooler"]))
    assert not any(jax.tree.leaves(mask["bert"]["embeddings"]))
    assert not any(jax.tree.leaves(mask["bert"]["layer_0"]))


def test_port_bert_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BertConfig(
        vocab_size=TINY["vocab_size"],
        hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        max_position_embeddings=TINY["max_position"],
        type_vocab_size=TINY["type_vocab_size"],
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ported = port_bert(sd)

    enc = BertEncoder(nef=8, bert_cfg=TINY)
    b, t = 2, 6
    rng = np.random.default_rng(0)
    cap_lens = np.array([6, 4], np.int32)
    captions = np.zeros((b, t), np.int32)
    for i, l in enumerate(cap_lens):
        captions[i, :l] = rng.integers(1, TINY["vocab_size"], (l,))

    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(captions), jnp.asarray(cap_lens),
        train=False,
    )
    params = dict(variables["params"])
    params["bert"] = ported["bert"]

    # compare the transformer trunk: hidden states + pooled output
    from sba_gan_tpu.models.text_bert import BertModel as FlaxBert

    mask = (np.arange(t)[None, :] < cap_lens[:, None]).astype(np.int32)
    hidden, pooled = FlaxBert(TINY).apply(
        {"params": ported["bert"]}, jnp.asarray(captions), jnp.asarray(mask)
    )
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(captions).long(),
            attention_mask=torch.from_numpy(mask).long(),
        )
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5
    )
