"""Bi-directional LSTM/GRU text encoder, TPU-native.

Capability parity with the reference RNN_ENCODER
(AttnGAN2/code/model.py:75-159): embedding(300) -> dropout(0.5) -> 1-layer
bi-LSTM (or GRU, cfg.RNN_TYPE) -> word embeddings (per-step outputs) and
sentence embedding (final hidden states of both directions).

TPU-first redesign: the reference relies on cuDNN PackedSequence over a
length-sorted batch (model.py:140-149).  Here sequences stay in input order
at static shape, and a masked ``lax.scan`` freezes the recurrent state at
padded steps — the exact semantics packing provides:

* per-step outputs are zero at padded positions (pad_packed_sequence),
* the forward final state is taken at t = len-1,
* the backward direction starts at t = len-1 (its state is frozen until the
  scan, which runs from t = T-1 down, reaches the last valid token).

Gate math and parameter layout follow torch (i,f,g,o packing, both bias
vectors) so released checkpoints port weight-for-weight
(SURVEY.md hard-part #2).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _RecurrentParams(nn.Module):
    """One direction's parameters in torch layout: w_ih (4H|3H, in),
    w_hh (4H|3H, H), b_ih, b_hh — all uniform(-1/sqrt(H), 1/sqrt(H))."""

    input_dim: int
    hidden: int
    gates: int  # 4 for LSTM, 3 for GRU

    @nn.compact
    def __call__(self):
        g, h, i = self.gates, self.hidden, self.input_dim
        bound = 1.0 / (h ** 0.5)
        init = _uniform_init(bound)
        w_ih = self.param("w_ih", init, (g * h, i))
        w_hh = self.param("w_hh", init, (g * h, h))
        b_ih = self.param("b_ih", init, (g * h,))
        b_hh = self.param("b_hh", init, (g * h,))
        return w_ih, w_hh, b_ih, b_hh


def _lstm_step(gi, state, w_hh, b_hh, hidden):
    # gi = x @ w_ih.T + b_ih, precomputed for ALL timesteps as one batched
    # matmul outside the scan (TPU: the sequential chain keeps only the
    # hidden-side matmul; same summation order as the in-step form).
    h, c = state
    z = gi + h @ w_hh.T + b_hh
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


def _gru_step(gi, state, w_hh, b_hh, hidden):
    (h,) = state
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h_new = (1.0 - z) * n + z * h
    return h_new, (h_new,)


class RNNEncoder(nn.Module):
    """Returns (words_emb (B, T, nhidden), sent_emb (B, nhidden))."""

    ntoken: int
    ninput: int = 300
    nhidden: int = 256  # total over both directions (cfg.TEXT.EMBEDDING_DIM)
    drop_prob: float = 0.5
    rnn_type: str = "LSTM"  # 'LSTM' | 'GRU'
    bidirectional: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, captions, cap_lens, train: bool = True):
        """captions: (B, T) int32 token ids (0 == pad); cap_lens: (B,) int32."""
        b, t = captions.shape
        num_dir = 2 if self.bidirectional else 1
        hidden = self.nhidden // num_dir

        emb_table = self.param(
            "embedding", _uniform_init(0.1), (self.ntoken, self.ninput)
        )
        emb = jnp.take(emb_table, captions, axis=0)  # (B, T, ninput)
        emb = nn.Dropout(self.drop_prob, deterministic=not train)(emb)
        emb = emb.astype(self.dtype)

        step_fn = _lstm_step if self.rnn_type == "LSTM" else _gru_step
        gates = 4 if self.rnn_type == "LSTM" else 3

        valid = (
            jnp.arange(t)[None, :] < cap_lens[:, None]
        )  # (B, T) True at real tokens

        def run_direction(name, reverse):
            w_ih, w_hh, b_ih, b_hh = _RecurrentParams(
                self.ninput, hidden, gates, name=name
            )()
            w_ih = w_ih.astype(self.dtype)
            w_hh = w_hh.astype(self.dtype)
            b_ih = b_ih.astype(self.dtype)
            b_hh = b_hh.astype(self.dtype)

            init = (jnp.zeros((b, hidden), self.dtype),)
            if self.rnn_type == "LSTM":
                init = init + (jnp.zeros((b, hidden), self.dtype),)

            # Input projection for ALL timesteps as ONE (B*T, ninput) x
            # (ninput, gates*H) matmul (MXU-friendly); the scan's sequential
            # chain then carries only the small hidden-side matmul.  Same
            # per-element summation order as projecting inside the step.
            gi_all = emb @ w_ih.T + b_ih  # (B, T, gates*H)
            xs = (jnp.swapaxes(gi_all, 0, 1), jnp.swapaxes(valid, 0, 1))

            def scan_body(state, inp):
                gi_t, valid_t = inp
                out, new_state = step_fn(gi_t, state, w_hh, b_hh, hidden)
                m = valid_t[:, None]
                # freeze state and zero the output at padded steps
                new_state = tuple(
                    jnp.where(m, ns, s) for ns, s in zip(new_state, state)
                )
                out = jnp.where(m, out, 0.0)
                return new_state, out

            final_state, outs = jax.lax.scan(
                scan_body, init, xs, reverse=reverse
            )
            return jnp.swapaxes(outs, 0, 1), final_state[0]  # (B,T,H), (B,H)

        out_f, h_f = run_direction("fwd", reverse=False)
        if self.bidirectional:
            out_b, h_b = run_direction("bwd", reverse=True)
            words_emb = jnp.concatenate([out_f, out_b], axis=-1)
            sent_emb = jnp.concatenate([h_f, h_b], axis=-1)
        else:
            words_emb, sent_emb = out_f, h_f
        return words_emb, sent_emb
