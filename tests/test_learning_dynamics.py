"""Training-DYNAMICS assertions (VERDICT r4 weak-#4): beyond parity and
finiteness, the optimization loop must actually learn.

The reference's only dynamics evidence was eyeballing in-loop samples and
attention dumps (AttnGAN2/code/trainer.py:304-310); these tests assert it:

* GAN: over ~tens of tiny-dim steps on synthetic data, the discriminator's
  real/fake logit gap OPENS, and the generator RESPONDS to D's gradient —
  the reals carry a simple detectable statistic (bright mean), and G's
  fakes must move toward it while D learns to separate.
* DAMSM: overfitting one 8-sample batch must push sentence-level retrieval
  (image -> matching caption by cosine) well above the 1/8 chance level —
  the actual objective of the pretraining stage (pretrain_DAMSM.py:82-94).

Everything runs at GF_DIM=8-class sizes on the CPU backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sba_gan_tpu.config import cfg_from_dict

pytestmark = pytest.mark.slow  # compiles jitted train steps


B, T, NEF = 8, 6, 32


def _gan_cfg():
    return cfg_from_dict(
        {
            "TREE": {"BRANCH_NUM": 1, "BASE_SIZE": 64},
            "GAN": {"GF_DIM": 8, "DF_DIM": 8, "Z_DIM": 16, "W_DIM": 32,
                    "CONDITION_DIM": 12, "R_NUM": 1},
            "TEXT": {"EMBEDDING_DIM": NEF, "WORDS_NUM": T},
            "MODEL": {"INCEPTION_INPUT": 75},
            "TRAIN": {
                "BATCH_SIZE": B,
                # higher-than-reference lr so the dynamics are visible in
                # tens of steps instead of epochs
                "DISCRIMINATOR_LR": 1e-3,
                "GENERATOR_LR": 1e-3,
                # LAMBDA=0 drops the DAMSM branch: this test isolates the
                # ADVERSARIAL learning signal (the DAMSM signal has its own
                # test below and in test_damsm_pretrain.py)
                "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0, "GAMMA3": 10.0,
                           "LAMBDA": 0.0},
            },
        }
    )


def _batch(rng):
    """Synthetic reals with a learnable statistic: bright (mean +0.6),
    low-contrast images.  A fresh G emits ~zero-mean images, so D can
    separate on brightness and G must brighten to follow D's gradient."""
    imgs = (0.6 + 0.15 * rng.standard_normal((B, 64, 64, 3))).clip(-1, 1)
    captions = np.zeros((B, T), np.int32)
    cap_lens = rng.integers(3, T + 1, (B,)).astype(np.int32)
    for i, l in enumerate(cap_lens):
        captions[i, :l] = rng.integers(1, 30, (l,))
    class_ids = np.arange(B, dtype=np.int32)  # all-distinct classes
    return ((jnp.asarray(imgs.astype(np.float32)),), jnp.asarray(captions),
            jnp.asarray(cap_lens), jnp.asarray(class_ids))


def _d_gap(models, state, reals, fakes, sent_emb):
    """Mean uncond-logit gap D(real) - D(fake) for the (single) D."""
    dmod, dstate = models.discriminators[0], state.ds[0]

    def logits(img):
        def inner(mod):
            return mod.uncond_logits(mod(img, False), False)

        out, _ = dmod.apply(
            {"params": dstate.params, "batch_stats": dstate.batch_stats},
            method=inner, mutable=["batch_stats"])
        return out

    return float(jnp.mean(logits(reals)) - jnp.mean(logits(fakes)))


def test_gan_adversarial_learning_signal():
    from sba_gan_tpu.train import (
        build_models, init_gan_state, make_gan_train_step, make_sample_fn,
    )

    cfg = _gan_cfg()
    rng = np.random.default_rng(0)
    models = build_models(cfg, 30)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))
    sample = make_sample_fn(cfg, models, use_ema=False)

    imgs, captions, cap_lens, class_ids = _batch(rng)
    key = jax.random.PRNGKey(1)

    def fakes_now(state):
        f, _ = sample(state, captions, cap_lens, jax.random.PRNGKey(7))
        return f[-1]

    # text encode once for the D-gap probe (the step re-does its own)
    words_embs, sent_emb = models.text_encoder.apply(
        state.text, captions, cap_lens, train=False)

    fakes0 = fakes_now(state)
    gap0 = _d_gap(models, state, imgs[0], fakes0, sent_emb)
    mean0 = float(jnp.mean(fakes0))

    logs_hist = []
    for _ in range(60):
        state, logs = step(state, imgs, captions, cap_lens, class_ids, key)
        logs_hist.append({k: float(v) for k, v in logs.items()})
    assert all(np.isfinite(list(l.values())).all() for l in logs_hist)

    fakes1 = fakes_now(state)
    gap1 = _d_gap(models, state, imgs[0], fakes1, sent_emb)
    mean1 = float(jnp.mean(fakes1))

    # 1. D learned to separate real from fake: the logit gap opens.
    assert gap1 > gap0 + 0.5, (gap0, gap1)
    assert gap1 > 0.5, gap1
    # 2. G responded to D's gradient: its output statistics moved toward
    #    the reals' signature brightness.
    assert mean1 > mean0 + 0.03, (mean0, mean1)
    # 3. G's parameters are actually being driven (non-trivial updates).
    assert logs_hist[-1]["errG"] != logs_hist[0]["errG"]


def test_damsm_retrieval_above_chance_after_overfit():
    from sba_gan_tpu.train.damsm import DAMSMTrainer, build_damsm_models

    cfg = cfg_from_dict(
        {
            "GAN": {"GF_DIM": 8},
            "TEXT": {"EMBEDDING_DIM": NEF, "WORDS_NUM": T},
            "MODEL": {"INCEPTION_INPUT": 75},
            "TRAIN": {"ENCODER_LR": 2e-3, "RNN_GRAD_CLIP": 0.25,
                      "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0,
                                 "GAMMA3": 10.0}},
        }
    )
    rng = np.random.default_rng(1)
    models = build_damsm_models(cfg, 30)
    trainer = DAMSMTrainer(cfg, models, 30)
    state = trainer.init_state(jax.random.PRNGKey(0))

    img = jnp.asarray(
        rng.uniform(-1, 1, (B, 75, 75, 3)).astype(np.float32))
    captions = np.zeros((B, T), np.int32)
    cap_lens = rng.integers(3, T + 1, (B,)).astype(np.int32)
    for i, l in enumerate(cap_lens):
        captions[i, :l] = rng.integers(1, 30, (l,))
    captions = jnp.asarray(captions)
    cap_lens = jnp.asarray(cap_lens)
    class_ids = jnp.asarray(np.arange(B, dtype=np.int32))
    key = jax.random.PRNGKey(2)

    def retrieval_at_1(state):
        region, code = models.image_encoder.apply(
            {"params": state.image_params,
             "batch_stats": state.image_batch_stats}, img, False)
        _, sent = models.text_encoder.apply(
            {"params": state.text_params}, captions, cap_lens, train=False)
        c = code / jnp.linalg.norm(code, axis=-1, keepdims=True)
        s = sent / jnp.linalg.norm(sent, axis=-1, keepdims=True)
        sim = c @ s.T  # (img, caption)
        return float(jnp.mean(jnp.argmax(sim, axis=1) == jnp.arange(B)))

    r0 = retrieval_at_1(state)
    first_total = None
    for _ in range(80):
        state, logs = trainer.train_step(state, img, captions, cap_lens,
                                         class_ids, key)
        if first_total is None:
            first_total = float(logs["total"])
    last_total = float(logs["total"])
    r1 = retrieval_at_1(state)

    assert np.isfinite(last_total)
    assert last_total < first_total, (first_total, last_total)
    # chance is 1/8 = 0.125; overfitting one batch must do far better
    assert r1 >= 0.5, (r0, r1)
