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


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy (requires torch at call time only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
