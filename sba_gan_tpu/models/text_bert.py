"""BERT text encoder, TPU-native (Flax linen).

Capability parity with the reference BertEncoder
(AttnGAN2/code/model_bert.py:161-189): a ``bert-base-uncased`` transformer
whose embeddings and encoder are frozen with the pooler left trainable
(model_bert.py:171-175 freezes children 0-1 — note the report's "all but
last layer" claim at docs/report/report.tex:219 does not match the code; we
replicate the code), followed by trainable projections:

* word vectors  -> 1x1 conv 768->nef + tanh  (here a Dense over the token
  axis — identical math),
* pooled output -> linear 768->nef + tanh.

The transformer itself is implemented here (attention + MLP blocks in plain
Flax, static shapes, bfloat16-friendly) rather than importing torch BERT;
pretrained weights port in from a HuggingFace torch state dict via
:func:`port_bert` (layout rules as in sba_gan_tpu.utils.torch_port).
Freezing is enforced at the optimizer level with
:func:`bert_trainable_mask`, matching the framework's treatment of the
Inception trunk.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

BERT_BASE = dict(
    vocab_size=30522,
    hidden_size=768,
    num_layers=12,
    num_heads=12,
    intermediate_size=3072,
    max_position=512,
    type_vocab_size=2,
    layer_norm_eps=1e-12,
)


class BertEmbeddings(nn.Module):
    cfg: Dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids):
        c = self.cfg
        t = input_ids.shape[1]
        word = nn.Embed(c["vocab_size"], c["hidden_size"], name="word_embeddings",
                        dtype=self.dtype)(input_ids)
        pos = nn.Embed(c["max_position"], c["hidden_size"],
                       name="position_embeddings", dtype=self.dtype)(
            jnp.arange(t)[None, :]
        )
        typ = nn.Embed(c["type_vocab_size"], c["hidden_size"],
                       name="token_type_embeddings", dtype=self.dtype)(token_type_ids)
        x = word + pos + typ
        return nn.LayerNorm(epsilon=c["layer_norm_eps"], name="LayerNorm",
                            dtype=self.dtype)(x)


class BertSelfAttention(nn.Module):
    cfg: Dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        h, nh = c["hidden_size"], c["num_heads"]
        d = h // nh
        q = nn.Dense(h, name="query", dtype=self.dtype)(x)
        k = nn.Dense(h, name="key", dtype=self.dtype)(x)
        v = nn.Dense(h, name="value", dtype=self.dtype)(x)
        b, t, _ = x.shape

        def split(a):
            return a.reshape(b, t, nh, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(d) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return ctx.transpose(0, 2, 1, 3).reshape(b, t, h)


class BertLayer(nn.Module):
    cfg: Dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        eps = c["layer_norm_eps"]
        attn = BertSelfAttention(c, dtype=self.dtype, name="attention_self")(
            x, attn_bias
        )
        attn = nn.Dense(c["hidden_size"], name="attention_output",
                        dtype=self.dtype)(attn)
        x = nn.LayerNorm(epsilon=eps, name="attention_LayerNorm",
                         dtype=self.dtype)(x + attn)
        y = nn.Dense(c["intermediate_size"], name="intermediate",
                     dtype=self.dtype)(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c["hidden_size"], name="output", dtype=self.dtype)(y)
        return nn.LayerNorm(epsilon=eps, name="output_LayerNorm",
                            dtype=self.dtype)(x + y)


class BertModel(nn.Module):
    cfg: Dict
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids
        )
        # additive mask: 0 at valid tokens, -1e9 at padding (HF convention)
        attn_bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, -1e9
        ).astype(jnp.float32)
        for i in range(c["num_layers"]):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, attn_bias)
        # pooler: first-token tanh dense (HF BertPooler)
        pooled = jnp.tanh(
            nn.Dense(c["hidden_size"], name="pooler", dtype=self.dtype)(x[:, 0])
        )
        return x, pooled


class BertEncoder(nn.Module):
    """Reference BertEncoder (model_bert.py:161-189): BERT + projections.

    __call__(captions, cap_lens, train) -> (words_emb (B,T,nef),
    sent_emb (B,nef)), the same interface as RNNEncoder; cap_lens derives
    the attention mask (the reference builds it from pads the same way,
    datasets_bert.py captions are 0-padded BERT ids).
    """

    nef: int = 256
    bert_cfg: Optional[Dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, captions, cap_lens, train: bool = True):
        c = dict(self.bert_cfg or BERT_BASE)
        t = captions.shape[1]
        mask = (jnp.arange(t)[None, :] < cap_lens[:, None]).astype(jnp.int32)
        hidden, pooled = BertModel(c, dtype=self.dtype, name="bert")(
            captions, mask
        )
        # word projection: reference conv1x1 768->nef over the (B,768,T,1)
        # view (model_bert.py:181-185) == Dense over the last axis.
        words = jnp.tanh(
            nn.Dense(self.nef, name="emb_words", dtype=self.dtype)(hidden)
        )
        sent = jnp.tanh(
            nn.Dense(self.nef, name="emb_sent", dtype=self.dtype)(pooled)
        )
        # zero padded positions like the RNN path (pad_packed semantics)
        words = words * mask[:, :, None].astype(words.dtype)
        return words.astype(jnp.float32), sent.astype(jnp.float32)


def bert_trainable_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True where a BertEncoder parameter trains: the projection heads and
    the pooler; embeddings + encoder stay frozen (model_bert.py:171-175)."""

    def fill(tree, value):
        return jax.tree.map(lambda _: value, tree)

    out = {}
    for k, v in params.items():
        if k in ("emb_words", "emb_sent"):
            out[k] = fill(v, True)
        elif k == "bert":
            out[k] = {
                bk: fill(bv, bk == "pooler") for bk, bv in v.items()
            }
        else:
            out[k] = fill(v, False)
    return out


def port_bert(state_dict: Mapping[str, np.ndarray], nef: int = 256) -> Dict[str, Any]:
    """Convert a HuggingFace torch ``bert-base-uncased`` state dict into
    BertEncoder params (projection heads keep their fresh init unless present).

    HF key layout: ``bert.embeddings.word_embeddings.weight``,
    ``bert.encoder.layer.N.attention.self.query.weight`` etc.; a bare dict
    without the ``bert.`` prefix is accepted too.
    """
    from sba_gan_tpu.utils.torch_port import dense_kernel

    p: Dict[str, Any] = {"bert": {"embeddings": {}, "pooler": {}}}

    def put(path, v):
        node = p
        for q in path[:-1]:
            node = node.setdefault(q, {})
        node[path[-1]] = np.asarray(v)

    for key, v in state_dict.items():
        k = key[5:] if key.startswith("bert.") else key
        parts = k.split(".")
        if parts[0] == "embeddings":
            if parts[1] in ("word_embeddings", "position_embeddings",
                            "token_type_embeddings"):
                put(("bert", "embeddings", parts[1], "embedding"), v)
            elif parts[1] == "LayerNorm":
                leaf = "scale" if parts[2] in ("weight", "gamma") else "bias"
                put(("bert", "embeddings", "LayerNorm", leaf), v)
        elif parts[0] == "encoder" and parts[1] == "layer":
            i = int(parts[2])
            rest = parts[3:]
            base = ("bert", f"layer_{i}")
            if rest[:2] == ["attention", "self"]:
                name = rest[2]  # query|key|value
                leaf = "kernel" if rest[3] == "weight" else "bias"
                vv = dense_kernel(v) if leaf == "kernel" else v
                put(base + ("attention_self", name, leaf), vv)
            elif rest[:2] == ["attention", "output"]:
                if rest[2] == "dense":
                    leaf = "kernel" if rest[3] == "weight" else "bias"
                    vv = dense_kernel(v) if leaf == "kernel" else v
                    put(base + ("attention_output", leaf), vv)
                else:  # LayerNorm
                    leaf = "scale" if rest[3] in ("weight", "gamma") else "bias"
                    put(base + ("attention_LayerNorm", leaf), v)
            elif rest[0] == "intermediate":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                vv = dense_kernel(v) if leaf == "kernel" else v
                put(base + ("intermediate", leaf), vv)
            elif rest[0] == "output":
                if rest[1] == "dense":
                    leaf = "kernel" if rest[2] == "weight" else "bias"
                    vv = dense_kernel(v) if leaf == "kernel" else v
                    put(base + ("output", leaf), vv)
                else:
                    leaf = "scale" if rest[2] in ("weight", "gamma") else "bias"
                    put(base + ("output_LayerNorm", leaf), v)
        elif parts[0] == "pooler":
            leaf = "kernel" if parts[2] == "weight" else "bias"
            vv = dense_kernel(v) if leaf == "kernel" else v
            put(("bert", "pooler", leaf), vv)
        # cls.* (MLM heads) are intentionally dropped
    return p
