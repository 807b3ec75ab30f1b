"""Parity test: masked-scan bi-LSTM/GRU vs torch's PackedSequence encoder.

Ports the torch LSTM weights into the JAX module and checks that word-level
outputs and the final-state sentence embedding agree with
pack_padded_sequence semantics (SURVEY.md hard-part #2)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from sba_gan_tpu.models.text_rnn import RNNEncoder

NTOKEN, NINPUT, NHIDDEN, B, T = 50, 12, 16, 5, 9


def _torch_forward(rnn_type, captions, cap_lens, emb_np):
    torch.manual_seed(0)
    emb = torch.nn.Embedding(NTOKEN, NINPUT)
    with torch.no_grad():
        emb.weight.copy_(torch.from_numpy(emb_np))
    cls = torch.nn.LSTM if rnn_type == "LSTM" else torch.nn.GRU
    rnn = cls(NINPUT, NHIDDEN // 2, 1, batch_first=True, bidirectional=True)

    x = emb(torch.from_numpy(captions))
    # torch packing requires a length-sorted batch; sort + unsort here so the
    # oracle sees the same per-sample data as the unsorted JAX path.
    order = np.argsort(-cap_lens)
    inv = np.argsort(order)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x[order], cap_lens[order].tolist(), batch_first=True
    )
    out, hidden = rnn(packed)
    out = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=T
    )[0]
    h = hidden[0] if rnn_type == "LSTM" else hidden
    sent = h.transpose(0, 1).reshape(B, -1)
    return out[inv].detach().numpy(), sent[inv].detach().numpy(), rnn


def _port_weights(variables, rnn, emb_np):
    params = jax.tree_util.tree_map(lambda x: np.asarray(x), variables["params"])
    params["embedding"] = emb_np
    for name, suffix in (("fwd", ""), ("bwd", "_reverse")):
        params[name]["w_ih"] = rnn.state_dict()[f"weight_ih_l0{suffix}"].numpy()
        params[name]["w_hh"] = rnn.state_dict()[f"weight_hh_l0{suffix}"].numpy()
        params[name]["b_ih"] = rnn.state_dict()[f"bias_ih_l0{suffix}"].numpy()
        params[name]["b_hh"] = rnn.state_dict()[f"bias_hh_l0{suffix}"].numpy()
    return {"params": params}


def _run_parity(rnn_type, rng):
    captions = rng.integers(1, NTOKEN, size=(B, T)).astype(np.int32)
    cap_lens = np.array([9, 4, 7, 1, 6], dtype=np.int32)
    for i in range(B):
        captions[i, cap_lens[i]:] = 0
    emb_np = rng.standard_normal((NTOKEN, NINPUT)).astype(np.float32)

    want_words, want_sent, rnn = _torch_forward(rnn_type, captions, cap_lens, emb_np)

    enc = RNNEncoder(ntoken=NTOKEN, ninput=NINPUT, nhidden=NHIDDEN, rnn_type=rnn_type)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(captions), jnp.asarray(cap_lens),
        train=False,
    )
    variables = _port_weights(variables, rnn, emb_np)
    words, sent = enc.apply(
        variables, jnp.asarray(captions), jnp.asarray(cap_lens), train=False
    )
    np.testing.assert_allclose(np.asarray(words), want_words, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sent), want_sent, atol=2e-5)


def test_lstm_matches_torch_packed(rng):
    _run_parity("LSTM", rng)


def test_gru_matches_torch_packed(rng):
    _run_parity("GRU", rng)


def test_output_shapes(rng):
    captions = rng.integers(1, NTOKEN, size=(B, T)).astype(np.int32)
    cap_lens = np.full((B,), T, dtype=np.int32)
    enc = RNNEncoder(ntoken=NTOKEN, ninput=NINPUT, nhidden=NHIDDEN)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(captions), jnp.asarray(cap_lens),
        train=False,
    )
    words, sent = enc.apply(
        variables, jnp.asarray(captions), jnp.asarray(cap_lens), train=False
    )
    assert words.shape == (B, T, NHIDDEN)
    assert sent.shape == (B, NHIDDEN)
