"""Shape/wiring tests for the generator & discriminator stacks — the JAX
analogue of the reference's model_test.ipynb smoke checks (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.models.attention import WordAttention, damsm_attention
from sba_gan_tpu.models.blocks import glu, instance_norm_2d, upsample_nearest_2x
from sba_gan_tpu.models.discriminator import build_discriminators
from sba_gan_tpu.models.generator import build_generator

B, T, NEF = 4, 10, 256


def tiny_cfg(**over):
    d = {
        "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 16, "W_DIM": 32,
                "CONDITION_DIM": 12, "R_NUM": 1},
        "TEXT": {"EMBEDDING_DIM": NEF, "WORDS_NUM": T},
        "TREE": {"BRANCH_NUM": 3},
    }
    for k, v in over.items():
        grp, key = k.split(".")
        d.setdefault(grp, {})[key] = v
    return cfg_from_dict(d)


def _gen_inputs(cfg, rng, mixing=False):
    z_shape = (2, B, cfg.GAN.Z_DIM) if mixing else (B, cfg.GAN.Z_DIM)
    z = rng.standard_normal(z_shape).astype(np.float32)
    sent = rng.standard_normal((B, NEF)).astype(np.float32)
    words = rng.standard_normal((B, T, NEF)).astype(np.float32)
    mask = np.zeros((B, T), dtype=bool)
    mask[:, 6:] = True
    return jnp.asarray(z), jnp.asarray(sent), jnp.asarray(words), jnp.asarray(mask)


def test_glu_and_upsample():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 2, 2, 4)
    y = glu(x)
    assert y.shape == (1, 2, 2, 2)
    up = upsample_nearest_2x(x)
    assert up.shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(up[0, 0, 0]), np.asarray(up[0, 1, 1]))


def test_instance_norm():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 3)) * 5 + 3)
    y = np.asarray(instance_norm_2d(x))
    np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(1, 2)), 1.0, atol=1e-3)


def test_word_attention_masking(rng):
    h = jnp.asarray(rng.standard_normal((B, 4, 4, 8)).astype(np.float32))
    words = rng.standard_normal((B, T, NEF)).astype(np.float32)
    mask = np.zeros((B, T), dtype=bool)
    mask[:, 3:] = True
    att = WordAttention(idf=8)
    vs = att.init(jax.random.PRNGKey(0), h, jnp.asarray(words), jnp.asarray(mask))
    ctx, attn = att.apply(vs, h, jnp.asarray(words), jnp.asarray(mask))
    assert ctx.shape == (B, 4, 4, 8)
    assert attn.shape == (B, 4, 4, T)
    a = np.asarray(attn)
    assert np.all(a[..., 3:] == 0.0)  # masked words get zero weight
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)

    # garbage in masked word slots must not leak into the context
    words2 = words.copy()
    words2[:, 3:] = 999.0
    ctx2, _ = att.apply(vs, h, jnp.asarray(words2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx2), atol=1e-5)


def test_damsm_attention_shapes(rng):
    words = jnp.asarray(rng.standard_normal((B, T, 32)).astype(np.float32))
    regions = jnp.asarray(rng.standard_normal((B, 17, 32)).astype(np.float32))
    lens = jnp.asarray(np.array([10, 5, 3, 7], dtype=np.int32))
    pad = jnp.arange(T)[None, :] >= lens[:, None]
    ctx, attn = damsm_attention(words, regions, 4.0, pad)
    assert ctx.shape == (B, T, 32)
    assert attn.shape == (B, T, 17)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("branch_num", [1, 2, 3])
def test_generator_shapes(rng, branch_num):
    cfg = tiny_cfg(**{"TREE.BRANCH_NUM": branch_num})
    gen = build_generator(cfg)
    z, sent, words, mask = _gen_inputs(cfg, rng)
    vs = gen.init(
        {"params": jax.random.PRNGKey(0)},
        z, sent, words, mask, jax.random.PRNGKey(1), train=False,
    )
    imgs, atts, mu, logvar = gen.apply(
        vs, z, sent, words, mask, jax.random.PRNGKey(1), train=False
    )
    assert len(imgs) == branch_num
    for i, img in enumerate(imgs):
        s = 64 * 2 ** i
        assert img.shape == (B, s, s, 3)
        assert np.all(np.abs(np.asarray(img)) <= 1.0)
    assert len(atts) == branch_num - 1
    assert mu.shape == (B, cfg.GAN.CONDITION_DIM)
    assert logvar.shape == (B, cfg.GAN.CONDITION_DIM)


def test_generator_style_mixing(rng):
    cfg = tiny_cfg(**{"GAN.INIT_Z_CONCAT": False})
    cfg.TRAIN.MIXING = True
    cfg.GAN.M_NUM = 8
    gen = build_generator(cfg)
    z, sent, words, mask = _gen_inputs(cfg, rng, mixing=True)
    vs = gen.init(
        {"params": jax.random.PRNGKey(0)},
        z, sent, words, mask, jax.random.PRNGKey(1), train=False,
    )
    imgs, atts, _, _ = gen.apply(
        vs, z, sent, words, mask, jax.random.PRNGKey(1), train=False
    )
    assert [im.shape[1] for im in imgs] == [64, 128, 256]


def test_dcgan_generator(rng):
    cfg = tiny_cfg()
    cfg.GAN.B_DCGAN = True
    gen = build_generator(cfg)
    z, sent, words, mask = _gen_inputs(cfg, rng)
    vs = gen.init(
        {"params": jax.random.PRNGKey(0)},
        z, sent, words, mask, jax.random.PRNGKey(1), train=False,
    )
    imgs, atts, _, _ = gen.apply(
        vs, z, sent, words, mask, jax.random.PRNGKey(1), train=False
    )
    assert len(imgs) == 1
    assert imgs[0].shape == (B, 256, 256, 3)


def test_discriminators(rng):
    cfg = tiny_cfg()
    ds = build_discriminators(cfg)
    assert len(ds) == 3
    sent = jnp.asarray(rng.standard_normal((B, NEF)).astype(np.float32))
    for i, d in enumerate(ds):
        s = 64 * 2 ** i
        img = jnp.asarray(rng.standard_normal((B, s, s, 3)).astype(np.float32))
        vs = d.init(jax.random.PRNGKey(i), img, sent, train=False, method=d.init_all)
        code = d.apply(vs, img, train=False)
        assert code.shape == (B, 4, 4, cfg.GAN.DF_DIM * 8)
        cond = d.apply(vs, code, sent, train=False, method=d.cond_logits)
        assert cond.shape == (B,)
        unc = d.apply(vs, code, train=False, method=d.uncond_logits)
        assert unc.shape == (B,)


def test_dcgan_discriminator_no_uncond(rng):
    cfg = tiny_cfg()
    cfg.GAN.B_DCGAN = True
    ds = build_discriminators(cfg)
    assert len(ds) == 1
    assert ds[0].b_jcu is False


def test_rgb_head_pad_exact_identity(rng):
    """JAX.RGB_HEAD_PAD computes the to-RGB convs at N zero-padded output
    channels and slices back (models/blocks.py _LanePaddedConv3x3): the
    parameter tree, outputs, AND gradients must be identical to the plain
    conv (exact math — it is purely an MXU lane-packing lever)."""
    cfg0 = tiny_cfg()
    cfg8 = tiny_cfg(**{"JAX.RGB_HEAD_PAD": 8})
    g0, g8 = build_generator(cfg0), build_generator(cfg8)
    z, sent, words, mask = _gen_inputs(cfg0, rng)
    key = jax.random.PRNGKey(0)
    v0 = g0.init(key, z, sent, words, mask, key, True)
    v8 = g8.init(key, z, sent, words, mask, key, True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 v0["params"], v8["params"])

    def loss(gen, params, bs):
        (fakes, _, _, _), _ = gen.apply(
            {"params": params, "batch_stats": bs}, z, sent, words, mask,
            key, True, mutable=["batch_stats"])
        return sum(jnp.sum(f ** 2) for f in fakes)

    l0, grads0 = jax.value_and_grad(
        lambda p: loss(g0, p, v0["batch_stats"]))(v0["params"])
    l8, grads8 = jax.value_and_grad(
        lambda p: loss(g8, p, v8["batch_stats"]))(v8["params"])
    assert np.allclose(float(l0), float(l8), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        grads0, grads8)


def test_conv_wgrad_dot_parity(rng):
    """JAX.CONV_WGRAD_DOT keeps the forward lowering and replaces the
    ResBlock convs' weight-gradient lowering with shifted-view MXU dots
    (models/blocks.py conv3x3_dot_wgrad): same parameter tree, identical
    outputs, gradients equal to the autodiff conv wgrad."""
    cfg0 = tiny_cfg()
    cfgd = tiny_cfg(**{"JAX.CONV_WGRAD_DOT": True})
    g0, gd = build_generator(cfg0), build_generator(cfgd)
    z, sent, words, mask = _gen_inputs(cfg0, rng)
    key = jax.random.PRNGKey(0)
    v0 = g0.init(key, z, sent, words, mask, key, True)
    vd = gd.init(key, z, sent, words, mask, key, True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 v0["params"], vd["params"])

    def loss(gen, params, bs):
        (fakes, _, _, _), _ = gen.apply(
            {"params": params, "batch_stats": bs}, z, sent, words, mask,
            key, True, mutable=["batch_stats"])
        return sum(jnp.sum(jnp.sin(3.0 * f)) for f in fakes)

    l0, grads0 = jax.value_and_grad(
        lambda p: loss(g0, p, v0["batch_stats"]))(v0["params"])
    ld, gradsd = jax.value_and_grad(
        lambda p: loss(gd, p, vd["batch_stats"]))(vd["params"])
    np.testing.assert_allclose(float(l0), float(ld), rtol=1e-6)

    # the wgrad lowering reduces over (B,H,W) in a different order, so
    # f32 summation noise is expected on cancelling elements: assert
    # near-equality elementwise plus per-leaf direction (cosine)
    def close(a, b):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3 * (
            1.0 + float(np.max(np.abs(b)))))
        na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
        if na > 0 and nb > 0:
            cos = float(np.sum(np.asarray(a) * np.asarray(b))) / (na * nb)
            assert cos > 0.999999, cos

    jax.tree.map(close, grads0, gradsd)
