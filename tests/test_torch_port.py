"""Weight-port tests.

The round-trip tests fabricate torch-layout state dicts from Flax params and
check the converter reproduces the exact tree.  The LSTM parity test is the
real thing (SURVEY.md hard-part #2): torch nn.Embedding+nn.LSTM with packed
sequences vs our masked-scan RNNEncoder, same weights, same outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_gan_tpu.models.inception import CNNEncoder
from sba_gan_tpu.models.text_rnn import RNNEncoder
from sba_gan_tpu.utils.torch_port import (
    conv_kernel,
    dense_kernel,
    port_cnn_encoder,
    port_rnn_encoder,
)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_cnn_encoder_roundtrip():
    enc = CNNEncoder(nef=16, input_size=75)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)), False)
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])

    sd = {}
    for path, v in flat.items():
        if path[0] == "emb_features":
            sd["emb_features.weight"] = np.transpose(v, (3, 2, 0, 1))
        elif path[0] == "emb_cnn_code":
            name = "weight" if path[-1] == "kernel" else "bias"
            sd[f"emb_cnn_code.{name}"] = v.T if name == "weight" else v
        elif path[-1] == "kernel":  # backbone convs
            sd[".".join(path[1:-1]) + ".weight"] = np.transpose(v, (3, 2, 0, 1))
        elif path[-1] == "scale":
            sd[".".join(path[1:-1]) + ".weight"] = v
        else:
            sd[".".join(path[1:-1]) + ".bias"] = v
    for path, v in stats.items():
        leaf = "running_mean" if path[-1] == "mean" else "running_var"
        sd[".".join(path[1:-1]) + f".{leaf}"] = v
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.asarray(0)

    params, batch_stats = port_cnn_encoder(sd)
    got = _flatten(params)
    for path, v in flat.items():
        np.testing.assert_array_equal(got[path], v, err_msg=str(path))
    got_stats = _flatten(batch_stats)
    for path, v in stats.items():
        np.testing.assert_array_equal(got_stats[path], v, err_msg=str(path))


def test_rnn_encoder_lstm_parity_vs_torch():
    torch = pytest.importorskip("torch")
    ntoken, ninput, nhidden, b, t = 20, 8, 12, 4, 5
    enc = RNNEncoder(ntoken=ntoken, ninput=ninput, nhidden=nhidden)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.ones((b, t), jnp.int32),
        jnp.full((b,), t, jnp.int32),
        train=False,
    )

    torch.manual_seed(0)
    emb = torch.nn.Embedding(ntoken, ninput)
    lstm = torch.nn.LSTM(ninput, nhidden // 2, batch_first=True, bidirectional=True)

    sd = {"encoder.weight": emb.weight.detach().numpy()}
    for tname, ours in [("l0", "fwd"), ("l0_reverse", "bwd")]:
        for kind in ["weight_ih", "weight_hh", "bias_ih", "bias_hh"]:
            sd[f"rnn.{kind}_{tname}"] = getattr(lstm, f"{kind}_{tname}").detach().numpy()
    params = port_rnn_encoder(sd)
    variables = {"params": params}

    rng = np.random.default_rng(0)
    cap_lens = np.array([5, 3, 4, 2], np.int32)
    captions = np.zeros((b, t), np.int32)
    for i, l in enumerate(cap_lens):
        captions[i, :l] = rng.integers(1, ntoken, (l,))

    words_emb, sent_emb = enc.apply(
        variables, jnp.asarray(captions), jnp.asarray(cap_lens), train=False
    )

    with torch.no_grad():
        e = emb(torch.from_numpy(captions).long())
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            e, cap_lens.tolist(), batch_first=True, enforce_sorted=False
        )
        out, (h, _) = lstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=t
        )
        # reference sent_emb: final hidden of both directions concatenated
        # (model.py:155-158 transposes nhidden*num_dir)
        sent_ref = torch.cat([h[0], h[1]], dim=1).numpy()

    np.testing.assert_allclose(np.asarray(words_emb), out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sent_emb), sent_ref, atol=1e-5)


def test_kernel_transforms():
    w = np.arange(24).reshape(2, 3, 2, 2).astype(np.float32)  # OIHW
    k = conv_kernel(w)
    assert k.shape == (2, 2, 3, 2)  # HWIO
    assert k[0, 1, 2, 1] == w[1, 2, 0, 1]
    d = dense_kernel(np.arange(6).reshape(2, 3).astype(np.float32))
    assert d.shape == (3, 2)


def test_resize_align_corners_parity_vs_torch():
    """The matmul-formulated bilinear resize matches torch
    F.interpolate(..., mode='bilinear', align_corners=True) — the exact op
    the reference applies before Inception (AttnGAN2/code/model.py:210) —
    for upsampling (256->299, gen2's x2) and downsampling."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from sba_gan_tpu.models.inception import resize_bilinear_align_corners

    rng = np.random.default_rng(0)
    for (h, w), (oh, ow) in [((16, 16), (19, 19)), ((8, 12), (16, 24)),
                             ((17, 17), (8, 8)), ((5, 5), (1, 1))]:
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (oh, ow)))
        want = (
            F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                          size=(oh, ow), mode="bilinear", align_corners=True)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_align_corners_grad_is_finite_and_linear():
    from sba_gan_tpu.models.inception import resize_bilinear_align_corners

    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 8, 8, 2)).astype(np.float32))
    f = lambda a: jnp.sum(resize_bilinear_align_corners(a, (13, 13)) ** 2)
    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    # linear map: resize(2x) == 2 * resize(x)
    y1 = resize_bilinear_align_corners(x, (13, 13))
    y2 = resize_bilinear_align_corners(2.0 * x, (13, 13))
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-5)
