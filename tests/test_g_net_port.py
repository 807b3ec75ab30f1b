"""G_NET checkpoint-port round trip: fabricate a reference-layout torch
state dict from an initialized Flax GNet and verify the converter fills the
exact same tree (names, shapes, transposes)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.models.generator import build_generator
from sba_gan_tpu.utils.torch_port import port_g_net

pytestmark = pytest.mark.slow  # compiles jitted steps / subprocess meshes (quick tier: -m 'not slow')


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _torch_name(path):
    """Invert the flax->torch mapping for test fabrication."""
    mod = path[0]
    if mod == "CANet_0":
        return "ca_net.fc." + ("weight" if path[-1] == "kernel" else "bias"), "linear"
    if mod == "MappingNet_0":
        i = path[1].split("_")[1]
        return f"mapping_net.fc.{i}.weight", "linear"
    if mod == "InitStageG_0":
        if path[1] == "Dense_0":
            return "h_net1.fc.0.weight", "linear"
        if path[1] == "BatchNorm_0":
            leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                    "var": "running_var"}[path[-1]]
            return f"h_net1.fc.1.{leaf}", "raw"
        k = int(path[1].split("_")[1]) + 1
        if path[2] == "Conv3x3_0":
            return f"h_net1.upsample{k}.1.weight", "conv"
        leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}[path[-1]]
        return f"h_net1.upsample{k}.2.{leaf}", "raw"
    if mod.startswith("GetImageG_"):
        i = int(mod.split("_")[1]) + 1
        return f"img_net{i}.img.0.weight", "conv"
    if mod.startswith("NextStageG_"):
        j = int(mod.split("_")[1]) + 2
        if path[1] == "WordAttention_0":
            return f"h_net{j}.att.conv_context.weight", "conv1x1"
        if path[1] == "AdaINNorm_0":
            return (
                f"h_net{j}.adain.style."
                + ("weight" if path[-1] == "kernel" else "bias"),
                "linear",
            )
        if path[1].startswith("ResBlock_"):
            r = path[1].split("_")[1]
            if path[2] == "Conv3x3_0":
                return f"h_net{j}.residual.{r}.block.0.weight", "conv"
            if path[2] == "Conv3x3_1":
                return f"h_net{j}.residual.{r}.block.3.weight", "conv"
            idx = "1" if path[2] == "BatchNorm_0" else "4"
            leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                    "var": "running_var"}[path[-1]]
            return f"h_net{j}.residual.{r}.block.{idx}.{leaf}", "raw"
        if path[1] == "UpBlock_0":
            if path[2] == "Conv3x3_0":
                return f"h_net{j}.upsample.1.weight", "conv"
            leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                    "var": "running_var"}[path[-1]]
            return f"h_net{j}.upsample.2.{leaf}", "raw"
    raise KeyError(path)


def _to_torch(v, kind, leaf):
    if kind == "conv":
        return np.transpose(v, (3, 2, 0, 1))
    if kind == "conv1x1":
        return np.transpose(v)[:, :, None, None]
    if kind == "linear" and leaf == "kernel":
        return v.T
    return v


def test_g_net_port_roundtrip():
    cfg = cfg_from_dict(
        {"GAN": {"GF_DIM": 4, "Z_DIM": 8, "W_DIM": 16, "CONDITION_DIM": 8,
                 "R_NUM": 2},
         "TEXT": {"EMBEDDING_DIM": 16, "WORDS_NUM": 5},
         "TREE": {"BRANCH_NUM": 3}}
    )
    g = build_generator(cfg)
    v = g.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8)), jnp.zeros((2, 16)),
        jnp.zeros((2, 5, 16)), jnp.zeros((2, 5), bool),
        jax.random.PRNGKey(1), True,
    )
    flat_p = _flatten(v["params"])
    flat_s = _flatten(v["batch_stats"])

    sd = {}
    for path, val in flat_p.items():
        name, kind = _torch_name(path)
        sd[name] = _to_torch(val, kind, path[-1])
    for path, val in flat_s.items():
        name, kind = _torch_name(path)
        sd[name] = val
    sd["h_net1.fc.1.num_batches_tracked"] = np.asarray(0)

    params, batch_stats = port_g_net(sd)
    got_p, got_s = _flatten(params), _flatten(batch_stats)
    assert set(got_p) == set(flat_p)
    assert set(got_s) == set(flat_s)
    for path in flat_p:
        np.testing.assert_array_equal(got_p[path], flat_p[path], err_msg=str(path))
    for path in flat_s:
        np.testing.assert_array_equal(got_s[path], flat_s[path], err_msg=str(path))
