"""PyTorch -> Flax weight porting (SURVEY.md hard-part #3).

Converts reference-era torch ``state_dict`` checkpoints into this framework's
parameter pytrees so released weights reproduce images/IS within tolerance:

* :func:`port_cnn_encoder` — the DAMSM image encoder
  (``image_encoder{E}.pth``): torchvision inception_v3 sub-modules named as
  attributes (reference model.py:176-203) + ``emb_features`` /
  ``emb_cnn_code`` heads.  Also handles bare torchvision inception_v3 dicts
  (with ``fc``) for the IS classifier.
* :func:`port_rnn_encoder` — ``text_encoder{E}.pth``: embedding + bi-LSTM/GRU
  weights; torch packs gates i,f,g,o exactly like
  sba_gan_tpu.models.text_rnn, so tensors copy through unchanged.

Layout rules: torch conv OIHW -> flax HWIO; torch linear (out,in) ->
flax (in,out); BN weight/bias -> scale/bias, running_mean/var ->
batch_stats mean/var.  All functions take an in-memory dict of numpy arrays
(load ``.pth`` files with ``torch.load(..., map_location='cpu')`` and call
``{k: v.numpy() for k, v in sd.items()}``); no torch import happens here, so
the port works in torch-free environments too.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w)


def _set(tree: Dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def port_cnn_encoder(
    state_dict: Mapping[str, np.ndarray]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, batch_stats) for CNNEncoder / InceptionV3Classifier.

    Inception sub-module weights land under ``backbone``; the projection
    heads (``emb_features``, ``emb_cnn_code``) and the classifier ``fc``
    stay top-level, matching the Flax module structure.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[0] == "AuxLogits":
            # torchvision pretrained inception_v3 ships the aux classifier;
            # neither the DAMSM encoder nor the IS head uses it
            continue
        if parts[0] == "emb_features":
            # reference conv1x1 (model.py:205): conv OIHW, no bias
            if parts[-1] == "weight":
                _set(params, ("emb_features", "kernel"), conv_kernel(value))
            else:
                _set(params, ("emb_features", "bias"), value)
            continue
        if parts[0] == "emb_cnn_code":
            name = "kernel" if parts[-1] == "weight" else "bias"
            v = dense_kernel(value) if name == "kernel" else value
            _set(params, ("emb_cnn_code", name), v)
            continue
        if parts[0] == "fc":
            name = "kernel" if parts[-1] == "weight" else "bias"
            v = dense_kernel(value) if name == "kernel" else value
            _set(params, ("fc", name), v)
            continue
        # torchvision modules, e.g. Mixed_5b.branch1x1.conv.weight
        module_path = tuple(parts[:-1])
        leaf = parts[-1]
        if module_path and module_path[-1] == "conv" and leaf == "weight":
            _set(params, ("backbone",) + module_path + ("kernel",), conv_kernel(value))
        elif module_path and module_path[-1] == "bn":
            if leaf == "weight":
                _set(params, ("backbone",) + module_path + ("scale",), value)
            elif leaf == "bias":
                _set(params, ("backbone",) + module_path + ("bias",), value)
            elif leaf == "running_mean":
                _set(batch_stats, ("backbone",) + module_path + ("mean",), value)
            elif leaf == "running_var":
                _set(batch_stats, ("backbone",) + module_path + ("var",), value)
        else:
            raise KeyError(f"unrecognized inception key: {key}")
    return params, batch_stats


def port_rnn_encoder(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Returns params for RNNEncoder from a reference RNN_ENCODER state dict
    (model.py:75-131: `encoder` embedding + `rnn` torch LSTM/GRU)."""
    params: Dict[str, Any] = {}
    direction = {"l0": "fwd", "l0_reverse": "bwd"}
    for key, value in state_dict.items():
        if key == "encoder.weight":
            _set(params, ("embedding",), value)
            continue
        if key.startswith("rnn."):
            # rnn.weight_ih_l0 / rnn.bias_hh_l0_reverse ...
            name = key[len("rnn."):]
            kind, rest = name.split("_", 1)  # 'weight'|'bias'
            gate, layer = rest.split("_", 1)  # 'ih'|'hh', 'l0'|'l0_reverse'
            if layer not in direction:
                raise KeyError(f"multi-layer RNN not supported: {key}")
            leaf = f"{'w' if kind == 'weight' else 'b'}_{gate}"
            _set(params, (direction[layer], leaf), value)
            continue
        raise KeyError(f"unrecognized RNN_ENCODER key: {key}")
    return params


def port_g_net(
    state_dict: Mapping[str, np.ndarray]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, batch_stats) for GNet from a reference G_NET
    checkpoint (netG_epoch_{E}.pth — EMA weights already swapped in by the
    reference saver, trainer.py:159-170).

    Reference module names (model.py:440-492 / model_bert.py:542-594):
      ca_net.fc | mapping_net.fc.N | h_net1.fc.{0 linear,1 BN1d} |
      h_net1.upsampleK.{1 conv,2 BN} | img_netI.img.0 |
      h_netJ.{att.conv_context, adain.style, residual.R.block.{0,1,3,4},
      upsample.{1,2}}
    mapped onto the Flax tree (CANet_0, MappingNet_0, InitStageG_0,
    GetImageG_I, NextStageG_J with Conv3x3/BatchNorm submodules).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put_linear(flax_path, leaf, value):
        if leaf == "weight":
            _set(params, flax_path + ("kernel",), dense_kernel(value))
        else:
            _set(params, flax_path + ("bias",), value)

    def put_conv(flax_path, value):
        _set(params, flax_path + ("Conv_0", "kernel"), conv_kernel(value))

    def put_bn(flax_path, leaf, value):
        base = flax_path + ("BatchNorm_0",)
        if leaf == "weight":
            _set(params, base + ("scale",), value)
        elif leaf == "bias":
            _set(params, base + ("bias",), value)
        elif leaf == "running_mean":
            _set(batch_stats, base + ("mean",), value)
        elif leaf == "running_var":
            _set(batch_stats, base + ("var",), value)

    for key, value in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "ca_net":  # ca_net.fc.weight
            put_linear(("CANet_0", "Dense_0"), leaf, value)
        elif parts[0] == "mapping_net":  # mapping_net.fc.N.weight
            put_linear(("MappingNet_0", f"Dense_{parts[2]}"), leaf, value)
        elif parts[0] == "h_net1":
            if parts[1] == "fc":
                if parts[2] == "0":
                    put_linear(("InitStageG_0", "Dense_0"), leaf, value)
                else:  # fc.1 BatchNorm1d
                    put_bn(("InitStageG_0", "BatchNorm_0"), leaf, value)
            elif parts[1].startswith("upsample"):
                k = int(parts[1][len("upsample"):]) - 1
                base = ("InitStageG_0", f"UpBlock_{k}")
                if parts[2] == "1":
                    put_conv(base + ("Conv3x3_0",), value)
                else:
                    put_bn(base + ("BatchNorm_0",), leaf, value)
            else:
                raise KeyError(f"unrecognized G key: {key}")
        elif parts[0].startswith("img_net"):  # img_netI.img.0.weight
            i = int(parts[0][len("img_net"):]) - 1
            put_conv((f"GetImageG_{i}", "Conv3x3_0"), value)
        elif parts[0].startswith("h_net"):  # h_net2 / h_net3
            j = int(parts[0][len("h_net"):]) - 2
            base = (f"NextStageG_{j}",)
            if parts[1] == "att":  # att.conv_context: conv1x1 (idf,cdf,1,1)
                _set(
                    params,
                    base + ("WordAttention_0", "Dense_0", "kernel"),
                    np.transpose(value[:, :, 0, 0]),
                )
            elif parts[1] == "adain":  # adain.style linear
                put_linear(base + ("AdaINNorm_0", "Dense_0"), leaf, value)
            elif parts[1] == "residual":  # residual.R.block.{0,1,3,4}
                r, idx = parts[2], parts[4]
                rb = base + (f"ResBlock_{r}",)
                if idx == "0":
                    put_conv(rb + ("Conv3x3_0",), value)
                elif idx == "1":
                    put_bn(rb + ("BatchNorm_0",), leaf, value)
                elif idx == "3":
                    put_conv(rb + ("Conv3x3_1",), value)
                elif idx == "4":
                    put_bn(rb + ("BatchNorm_1",), leaf, value)
                else:
                    raise KeyError(f"unrecognized G key: {key}")
            elif parts[1] == "upsample":
                ub = base + ("UpBlock_0",)
                if parts[2] == "1":
                    put_conv(ub + ("Conv3x3_0",), value)
                else:
                    put_bn(ub + ("BatchNorm_0",), leaf, value)
            else:
                raise KeyError(f"unrecognized G key: {key}")
        else:
            raise KeyError(f"unrecognized G key: {key}")
    return params, batch_stats


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy (requires torch at call time only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
