"""Decompose the flagship train step's 310 ms (b128) into its time sinks.

The tunnel runtime makes jax.profiler traces unreliable (and
block_until_ready does not fence — CLAUDE.md), so the breakdown is
measured directly: each component program runs ALONE in a fresh process
with the honest value-fetch fence, and the full-step time minus component
times names the sinks.

MEASUREMENT RULE: one mode per process (HBM spill hazard — see
perf_ablation.py).  Modes:

    python scripts/perf_breakdown.py inception 128    # frozen encode fwd
    python scripts/perf_breakdown.py inception_vjp 128# encode fwd+grad
    python scripts/perf_breakdown.py gfwd 128         # generator forward
    python scripts/perf_breakdown.py gvjp 128         # generator fwd+vjp
    python scripts/perf_breakdown.py dsteps 128       # full step, LAMBDA=5
                                                      # (the full-step side
                                                      # of the nodamsm A/B;
                                                      # NOT a D-only slice)
    python scripts/perf_breakdown.py text 128         # bi-LSTM encode
    python scripts/perf_breakdown.py nodamsm 128      # full step, LAMBDA=0
    python scripts/perf_breakdown.py damsmloss 128    # words+sent loss f/b
    python scripts/perf_breakdown.py damsm_slice 128  # whole DAMSM branch
                                                      # as the step builds it
    python scripts/perf_breakdown.py sample 128       # EMA inference
                                                      # (text enc + G fwd)
    python scripts/perf_breakdown.py pretrain 32      # DAMSM pretrain step
                                                      # (299px, BRANCH=1)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.train import build_models, init_gan_state, make_gan_train_step


def flagship_cfg(lam=5.0, remat=True, chunks=4):
    # env overrides so trace captures / slice decompositions can run at
    # the CURRENT measured-best operating point (they default to the
    # round-1 flags otherwise): STEP_SIM_IMPL, STEP_CHUNKS, STEP_UPFUSED,
    # STEP_UPIMPL, STEP_ENC_MODE, STEP_REMAT, STEP_BNC.
    env = os.environ.get
    return cfg_from_dict(
        {
            "TREE": {"BRANCH_NUM": 3},
            "GAN": {"GF_DIM": 32, "DF_DIM": 64, "Z_DIM": 100, "R_NUM": 2},
            "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
            "TRAIN": {"BATCH_SIZE": 128,
                      "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0,
                                 "GAMMA3": 10.0, "LAMBDA": lam}},
            "JAX": {"DTYPE": "bfloat16",
                    "REMAT_IMAGE_ENCODER": env(
                        "STEP_REMAT", "1" if remat else "0") == "1",
                    "REMAT_IMAGE_ENCODER_MODE": env("STEP_ENC_MODE", "full"),
                    "DAMSM_CHUNKS": int(env("STEP_CHUNKS", str(chunks))),
                    "DAMSM_SIM_IMPL": env("STEP_SIM_IMPL", "xla"),
                    "UPBLOCK_FUSED": env("STEP_UPFUSED", "0") == "1",
                    "UPBLOCK_FUSED_IMPL": env("STEP_UPIMPL", "convt"),
                    "BN_COMPACT": env("STEP_BNC", "0") == "1",
                    "LOSS_DTYPE": "bfloat16"},
        }
    )


def fence_timed(fn, args, n=10, fetch=None):
    """fetch(out) -> float scalar pulled INSIDE the window (the fence)."""
    out = fn(*args)
    (fetch or (lambda o: float(jnp.sum(o[0] if isinstance(o, tuple) else o))))(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    v = (fetch or (lambda o: float(jnp.sum(o[0] if isinstance(o, tuple) else o))))(out)
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(v), v
    return dt


def main():
    if os.environ.get("STEP_PLATFORM") == "cpu":
        # env vars alone don't switch the preloaded axon backend
        jax.config.update("jax_platforms", "cpu")
    mode, b = sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = flagship_cfg(lam=0.0 if mode == "nodamsm" else 5.0)
    models = build_models(cfg, 5450)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    if mode in ("inception", "inception_vjp"):
        enc = models.image_encoder
        variables = enc.init(key, jnp.zeros((2, 64, 64, 3)), False)
        img = jnp.asarray(
            rng.uniform(-1, 1, (b, 256, 256, 3)).astype(np.float32))

        if mode == "inception":
            f = jax.jit(lambda v, x: enc.apply(v, x, False))
            dt = fence_timed(f, (variables, img),
                             fetch=lambda o: float(jnp.sum(o[1])))
        else:
            def loss(x):
                region, code = enc.apply(variables, x, False)
                return jnp.sum(region.astype(jnp.float32)) + jnp.sum(
                    code.astype(jnp.float32))

            f = jax.jit(jax.grad(loss))
            dt = fence_timed(f, (img,),
                             fetch=lambda o: float(jnp.sum(o)))
    elif mode in ("gfwd", "gvjp"):
        state = init_gan_state(cfg, models, key)
        gen = models.generator
        g_vars = {"params": state.g.params,
                  "batch_stats": state.g.batch_stats}
        t = cfg.TEXT.WORDS_NUM
        sent = jnp.asarray(rng.standard_normal((b, 256)).astype(np.float32))
        words = jnp.asarray(
            rng.standard_normal((b, t, 256)).astype(np.float32))
        mask = jnp.zeros((b, t), bool)
        z = jnp.asarray(rng.standard_normal((b, 100)).astype(np.float32))

        def fwd(z, sent, words):
            fakes, att, mu, logvar = gen.apply(
                g_vars, z, sent, words, mask, key, True,
                mutable=["batch_stats"])[0]
            return sum(jnp.sum(f.astype(jnp.float32)) for f in fakes)

        if mode == "gfwd":
            f = jax.jit(fwd)
            dt = fence_timed(f, (z, sent, words), fetch=lambda o: float(o))
        else:
            f = jax.jit(jax.grad(fwd, argnums=(1, 2)))
            dt = fence_timed(f, (z, sent, words),
                             fetch=lambda o: float(jnp.sum(o[0])))
    elif mode == "text":
        state = init_gan_state(cfg, models, key)
        te = models.text_encoder
        t = cfg.TEXT.WORDS_NUM
        caps = np.zeros((b, t), np.int32)
        lens = rng.integers(4, t + 1, (b,)).astype(np.int32)
        for i, l in enumerate(lens):
            caps[i, :l] = rng.integers(1, 5450, (l,))
        f = jax.jit(lambda c, l: te.apply(state.text, c, l, train=False))
        dt = fence_timed(f, (jnp.asarray(caps), jnp.asarray(lens)),
                         fetch=lambda o: float(jnp.sum(o[1])))
    elif mode in ("damsmloss", "damsm_slice"):
        from sba_gan_tpu.losses.damsm import sent_loss, words_loss

        state = init_gan_state(cfg, models, key)
        t = cfg.TEXT.WORDS_NUM
        words = jnp.asarray(
            rng.standard_normal((b, t, 256)).astype(np.float32))
        sent = jnp.asarray(rng.standard_normal((b, 256)).astype(np.float32))
        lens = jnp.asarray(rng.integers(4, t + 1, (b,)).astype(np.int32))
        cls = jnp.asarray(rng.integers(0, 200, (b,)).astype(np.int32))
        labels = jnp.arange(b)

        def loss_from(region, code):
            w0, w1 = words_loss(region, words, labels, lens, cls,
                                einsum_dtype=jnp.bfloat16,
                                grid_chunks=int(os.environ.get("GRID", "1")),
                                impl=os.environ.get("SIM_IMPL", "xla"),
                                fold_softmax=os.environ.get("FOLD") == "1")
            s0, s1 = sent_loss(code, sent, labels, cls)
            return w0 + w1 + s0 + s1

        if mode == "damsmloss":
            region = jnp.asarray(
                rng.standard_normal((b, 289, 256)).astype(np.float32))
            code = jnp.asarray(
                rng.standard_normal((b, 256)).astype(np.float32))
            f = jax.jit(jax.value_and_grad(loss_from, argnums=(0, 1)))
            dt = fence_timed(f, (region, code), fetch=lambda o: float(o[0]))
        else:
            # the branch exactly as make_gan_train_step builds it
            # (train/gan.py:336-363): resize-to-299 inside the encoder,
            # optional jax.checkpoint remat, DAMSM_CHUNKS lax.map, then the
            # losses; grad w.r.t. the fake 256px image only.
            enc = models.image_encoder
            chunks = int(os.environ.get("CHUNKS", "4"))
            encode = lambda img: enc.apply(state.image, img, False)
            if os.environ.get("REMAT", "1") == "1":
                encode = jax.checkpoint(encode)
            if chunks > 1:
                def encode_chunked(img, _enc=encode):
                    cs = img.reshape(chunks, b // chunks, *img.shape[1:])
                    region_c, code_c = jax.lax.map(_enc, cs)
                    return (region_c.reshape(b, *region_c.shape[2:]),
                            code_c.reshape(b, code_c.shape[-1]))
                encode = encode_chunked

            def slice_loss(fake):
                region, code = encode(fake)
                return loss_from(region, code)

            fake = jnp.asarray(
                rng.uniform(-1, 1, (b, 256, 256, 3)).astype(np.float32))
            f = jax.jit(jax.value_and_grad(slice_loss))
            dt = fence_timed(f, (fake,), fetch=lambda o: float(o[0]))
    elif mode == "sample":
        # honest inference throughput: make_sample_fn (text encode + EMA
        # 3-branch G forward), fence = host fetch of one output pixel.
        # Round 1's "32k img/s style-mixing inference" figure was an
        # enqueue-rate artifact; this is its replacement.
        from sba_gan_tpu.train import make_sample_fn

        state = init_gan_state(cfg, models, key)
        sample = jax.jit(make_sample_fn(cfg, models))
        t = cfg.TEXT.WORDS_NUM
        caps = np.zeros((b, t), np.int32)
        lens = rng.integers(4, t + 1, (b,)).astype(np.int32)
        for i, l in enumerate(lens):
            caps[i, :l] = rng.integers(1, 5450, (l,))
        dt = fence_timed(
            sample, (state, jnp.asarray(caps), jnp.asarray(lens), key),
            fetch=lambda o: float(jnp.sum(o[0][-1][0, 0, 0])))
        print(f"{mode}: batch={b} {dt * 1000:.1f} ms "
              f"{b / dt:.0f} img/s", flush=True)
        return
    elif mode == "pretrain":
        # The OTHER training workload: the DAMSM pretrain step exactly as
        # DAMSMTrainer jits it (train/damsm.py:141-219; reference
        # pretrain_DAMSM.py:49-130) at DAMSM/bird.yml dims — 299px images,
        # BRANCH_NUM=1, joint bi-LSTM + frozen-trunk Inception training
        # with grad clip and masked trunk grads.  Honest fence: host fetch
        # of the step's total loss inside the window.
        from sba_gan_tpu.train.damsm import DAMSMTrainer, build_damsm_models

        env = os.environ.get
        pcfg = cfg_from_dict(
            {
                "TREE": {"BRANCH_NUM": 1, "BASE_SIZE": 299},
                "TRAIN": {"BATCH_SIZE": b, "ENCODER_LR": 2e-4,
                          "RNN_GRAD_CLIP": 0.25,
                          "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0,
                                     "GAMMA3": 10.0}},
                "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
                # STEP_INC_INPUT/STEP_DTYPE: CPU smoke needs 75px + f32
                # (bf16 einsums are TPU-only; 299px Inception doesn't
                # compile in reasonable time on the 1-core host)
                "MODEL": {"INCEPTION_INPUT": int(env("STEP_INC_INPUT",
                                                     "299"))},
                "JAX": {"DTYPE": env("STEP_DTYPE", cfg.JAX.DTYPE),
                        "LOSS_DTYPE": env("STEP_DTYPE", cfg.JAX.LOSS_DTYPE),
                        "DAMSM_SIM_IMPL": cfg.JAX.DAMSM_SIM_IMPL,
                        # large-batch levers (train/damsm.py; VERDICT r4
                        # #6): sequential encoder sub-batches + encoder
                        # remat modes
                        "DAMSM_CHUNKS": int(env("STEP_PRETRAIN_CHUNKS",
                                                "1")),
                        "REMAT_IMAGE_ENCODER":
                            env("STEP_PRETRAIN_REMAT", "") != "",
                        "REMAT_IMAGE_ENCODER_MODE":
                            env("STEP_PRETRAIN_REMAT", "stem") or "stem"},
            }
        )
        dmodels = build_damsm_models(pcfg, 5450)
        trainer = DAMSMTrainer(pcfg, dmodels, 5450)
        state = trainer.init_state(key)
        size = pcfg.MODEL.INCEPTION_INPUT
        img = jnp.asarray(
            rng.uniform(-1, 1, (b, size, size, 3)).astype(np.float32))
        t = pcfg.TEXT.WORDS_NUM
        caps = np.zeros((b, t), np.int32)
        lens = rng.integers(4, t + 1, (b,)).astype(np.int32)
        for i, l in enumerate(lens):
            caps[i, :l] = rng.integers(1, 5450, (l,))
        cls = jnp.asarray(rng.integers(0, 200, (b,)).astype(np.int32))

        def pstep(state, img, caps, lens, cls):
            return trainer.train_step(state, img, caps, lens, cls,
                                      jax.random.PRNGKey(1))

        def pfence(o):
            state, logs = o
            return float(logs["total"])

        # thread state so consecutive steps chain (the fence then forces
        # every prior step through the dependency chain)
        out = pstep(state, img, jnp.asarray(caps), jnp.asarray(lens), cls)
        pfence(out)
        n = 10
        t0 = time.perf_counter()
        st = out[0]
        for _ in range(n):
            st, logs = pstep(st, img, jnp.asarray(caps), jnp.asarray(lens),
                             cls)
        v = float(logs["total"])
        dt = (time.perf_counter() - t0) / n
        assert np.isfinite(v), v
        print(f"{mode}: batch={b} {dt * 1000:.1f} ms {b / dt:.0f} img/s",
              flush=True)
        return
    elif mode in ("dsteps", "nodamsm"):
        # full step; for dsteps the proxy is nodamsm-vs-full decomposition
        state = init_gan_state(cfg, models, key)
        step = jax.jit(make_gan_train_step(cfg, models))
        t = cfg.TEXT.WORDS_NUM
        imgs = tuple(
            jnp.asarray(rng.uniform(-1, 1, (b, 64 * 2 ** i, 64 * 2 ** i, 3))
                        .astype(np.float32))
            for i in range(3)
        )
        caps = np.zeros((b, t), np.int32)
        lens = rng.integers(4, t + 1, (b,)).astype(np.int32)
        for i, l in enumerate(lens):
            caps[i, :l] = rng.integers(1, 5450, (l,))
        cls = rng.integers(0, 200, (b,)).astype(np.int32)
        args = (state, imgs, jnp.asarray(caps), jnp.asarray(lens),
                jnp.asarray(cls), key)

        def fetch(o):
            return float(o[1]["errG"])

        dt = fence_timed(step, args, fetch=fetch)
    else:
        raise SystemExit(f"unknown mode {mode}")

    print(f"{mode}: batch={b} {dt * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
