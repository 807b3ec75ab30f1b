"""GAN training: model assembly, state init, and the single-jit train step.

Capability parity with the reference trainer (AttnGAN2/code/trainer.py:28-327
and trainer_bert.py), re-designed TPU-first:

* The reference runs **4 separate optimizer steps per batch** (3 D graphs +
  1 G graph, trainer.py:238-315) as eager CUDA launches.  Here the whole
  update — text encode, G forward, three D updates, G update through the
  frozen Inception encoder and DAMSM losses, KL, and the EMA shadow — is ONE
  jitted function over the device mesh; XLA fuses/fissions it and inserts the
  gradient all-reduces (the reference has no multi-device path at all,
  SURVEY.md §2.4).
* Update ordering matches the reference exactly: every D is updated first on
  detached fakes, then G's loss is evaluated against the *updated*
  discriminators (trainer.py:258-296).
* The generator forward runs **once** per step via ``jax.vjp``: its primals
  feed the D updates (stop-gradient) and its pullback turns the G-loss
  cotangents into generator gradients — the functional equivalent of torch
  retaining the autograd graph across the D steps.
* EMA: ``avg_p = 0.999 avg_p + 0.001 p`` (trainer.py:298-299).

BatchNorm policy: D statistics are updated by the D step (real and fake
passes, like the reference's two forwards); the extra running-stat updates
the reference incurs during G's pass through D (train-mode side effect) are
dropped — they only affect eval-mode D inference, which the pipeline never
uses.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from sba_gan_tpu.losses.damsm import sent_loss, words_loss
from sba_gan_tpu.losses.gan import bce_logits, kl_loss
from sba_gan_tpu.models.discriminator import build_discriminators
from sba_gan_tpu.models.generator import build_generator
from sba_gan_tpu.models.inception import CNNEncoder
from sba_gan_tpu.models.text_rnn import RNNEncoder
from sba_gan_tpu.train.state import (
    GANTrainState,
    NetState,
    ema_update,
    gan_optimizers,
)


class GANModels(NamedTuple):
    """Static model definitions (reference build_models, trainer.py:48-130)."""

    text_encoder: nn.Module
    image_encoder: nn.Module
    generator: nn.Module
    discriminators: Tuple[nn.Module, ...]


def build_text_encoder(cfg, n_words: int) -> nn.Module:
    if cfg.MODEL.TEXT_ENCODER == "bert":
        from sba_gan_tpu.models.text_bert import BertEncoder

        return BertEncoder(
            nef=cfg.TEXT.EMBEDDING_DIM, dtype=jnp.dtype(cfg.JAX.DTYPE)
        )
    return RNNEncoder(
        ntoken=n_words,
        nhidden=cfg.TEXT.EMBEDDING_DIM,
        rnn_type=cfg.RNN_TYPE,
        dtype=jnp.dtype(cfg.JAX.DTYPE),
    )


def build_models(cfg, n_words: int) -> GANModels:
    return GANModels(
        text_encoder=build_text_encoder(cfg, n_words),
        image_encoder=CNNEncoder(
            nef=cfg.TEXT.EMBEDDING_DIM,
            input_size=cfg.MODEL.INCEPTION_INPUT,
            dtype=jnp.dtype(cfg.JAX.DTYPE),
        ),
        generator=build_generator(cfg),
        discriminators=tuple(build_discriminators(cfg)),
    )


def branch_sizes(cfg) -> Tuple[int, ...]:
    """Image sizes per branch, e.g. (64, 128, 256) (reference main.py:120)."""
    return tuple(
        cfg.TREE.BASE_SIZE * (2 ** i) for i in range(cfg.TREE.BRANCH_NUM)
    )


def noise_shape(cfg, batch: int) -> Tuple[int, ...]:
    if cfg.TRAIN.MIXING:
        return (2, batch, cfg.GAN.Z_DIM)
    return (batch, cfg.GAN.Z_DIM)


def init_gan_state(
    cfg,
    models: GANModels,
    rng: jax.Array,
    init_batch: int = 2,
    text_variables: Optional[Any] = None,
    image_variables: Optional[Any] = None,
) -> GANTrainState:
    """Initialize every network + optimizer state.  ``text_variables`` /
    ``image_variables`` slot in DAMSM-pretrained encoders (the reference
    loads them from cfg.TRAIN.NET_E, trainer.py:48-67); fresh random init
    otherwise (tests / smoke runs)."""
    b = init_batch
    t = cfg.TEXT.WORDS_NUM
    r_text, r_img, r_g, r_ca, *r_ds = jax.random.split(rng, 4 + len(models.discriminators))

    captions = jnp.ones((b, t), jnp.int32)
    cap_lens = jnp.full((b,), t, jnp.int32)
    if text_variables is None:
        text_variables = models.text_encoder.init(
            {"params": r_text, "dropout": r_text}, captions, cap_lens, train=False
        )
    if image_variables is None:
        image_variables = models.image_encoder.init(
            r_img, jnp.zeros((b, 64, 64, 3), jnp.float32), False
        )

    nef = cfg.TEXT.EMBEDDING_DIM
    z = jnp.zeros(noise_shape(cfg, b), jnp.float32)
    sent = jnp.zeros((b, nef), jnp.float32)
    words = jnp.zeros((b, t, nef), jnp.float32)
    mask = jnp.zeros((b, t), bool)
    g_vars = models.generator.init(r_g, z, sent, words, mask, r_ca, True)

    g_tx, d_tx = gan_optimizers(cfg)

    g_state = NetState(
        params=g_vars["params"],
        batch_stats=g_vars.get("batch_stats", {}),
        opt_state=g_tx.init(g_vars["params"]),
    )

    sizes = branch_sizes(cfg)
    d_sizes = sizes if not cfg.GAN.B_DCGAN else (sizes[-1],)
    d_states = []
    for dmod, r_d, s in zip(models.discriminators, r_ds, d_sizes):
        d_vars = dmod.init(
            r_d,
            jnp.zeros((b, s, s, 3), jnp.float32),
            sent,
            True,
            method="init_all",
        )
        d_states.append(
            NetState(
                params=d_vars["params"],
                batch_stats=d_vars.get("batch_stats", {}),
                opt_state=d_tx.init(d_vars["params"]),
            )
        )

    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g=g_state,
        g_ema=jax.tree.map(jnp.asarray, g_state.params),
        ds=tuple(d_states),
        text=text_variables,
        image=image_variables,
    )


def make_gan_train_step(cfg, models: GANModels, mesh=None):
    """Build the pure train-step function (jit it with the desired
    shardings).  Signature:

        step(state, imgs, captions, cap_lens, class_ids, rng)
            -> (new_state, logs)

    imgs: tuple of per-branch (B, S, S, 3) arrays in [-1, 1].

    With a mesh whose ``model`` axis is > 1, the DAMSM encoder activations
    get tensor-parallel sharding constraints (parallel.tensor_constraint):
    GSPMD shards the Inception channel dimension over 'model' and the batch
    over 'data' — DP x TP over one jitted program (validated end to end by
    tests/test_tensor_parallel.py::test_full_gan_step_dp_tp on a (4,2)
    virtual-CPU mesh).
    """
    from sba_gan_tpu.parallel import tensor_constraint

    constrain = tensor_constraint(mesh)
    gamma1 = cfg.TRAIN.SMOOTH.GAMMA1
    gamma2 = cfg.TRAIN.SMOOTH.GAMMA2
    gamma3 = cfg.TRAIN.SMOOTH.GAMMA3
    smooth_lambda = cfg.TRAIN.SMOOTH.LAMBDA
    remat_image_encoder = cfg.JAX.REMAT_IMAGE_ENCODER
    remat_encoder_mode = cfg.JAX.REMAT_IMAGE_ENCODER_MODE
    remat_generator = cfg.JAX.REMAT_GENERATOR
    remat_mode = cfg.JAX.REMAT_GENERATOR_MODE
    grad_accum = cfg.TRAIN.GRAD_ACCUM
    damsm_chunks = cfg.JAX.DAMSM_CHUNKS
    grid_chunks = cfg.JAX.DAMSM_GRID_CHUNKS
    sim_impl = cfg.JAX.DAMSM_SIM_IMPL
    sim_tile = cfg.JAX.DAMSM_SIM_TILE
    fold_softmax = cfg.JAX.DAMSM_FOLD_SOFTMAX
    loss_dtype = (jnp.bfloat16 if cfg.JAX.LOSS_DTYPE == "bfloat16"
                  else jnp.float32)
    # Observability: name the active words-loss implementation once at
    # step-build time so no bench/ablation can silently measure the wrong
    # path (the kernel falls back to XLA when B % tile != 0 — a one-time
    # warning fires in losses/damsm.py if that happens).
    if smooth_lambda > 0:
        upf = (f" upfused={cfg.JAX.UPBLOCK_FUSED_IMPL}"
               if cfg.JAX.UPBLOCK_FUSED else "")
        bnc = (f" bn_compact={cfg.JAX.BN_COMPACT}"
               if cfg.JAX.BN_COMPACT else "")
        enc = (f" remat_enc={cfg.JAX.REMAT_IMAGE_ENCODER_MODE}"
               if cfg.JAX.REMAT_IMAGE_ENCODER else " remat_enc=off")
        rg = (f" remat_g={cfg.JAX.REMAT_GENERATOR_MODE}"
              if cfg.JAX.REMAT_GENERATOR else "")
        rgb = (f" rgb_pad={cfg.JAX.RGB_HEAD_PAD}"
               if cfg.JAX.RGB_HEAD_PAD else "")
        rgb += " wgrad_dot" if cfg.JAX.CONV_WGRAD_DOT else ""
        print(f"[sba_gan_tpu] GAN step build: DAMSM_SIM_IMPL={sim_impl} "
              f"tile={sim_tile} chunks={damsm_chunks} "
              f"grid_chunks={grid_chunks} loss_dtype={cfg.JAX.LOSS_DTYPE}"
              f"{upf}{bnc}{enc}{rg}{rgb}",
              flush=True)
    g_tx, d_tx = gan_optimizers(cfg)
    generator = models.generator
    text_encoder = models.text_encoder
    image_encoder = models.image_encoder
    discriminators = models.discriminators

    def step(state: GANTrainState, imgs, captions, cap_lens, class_ids, rng):
        b = captions.shape[0]
        rng = jax.random.fold_in(rng, state.step)
        rng_z, rng_ca = jax.random.split(rng)

        # ---- 1. text encoding, detached (trainer.py:245-252) ----
        words_embs, sent_emb = text_encoder.apply(
            state.text, captions, cap_lens, train=False
        )
        words_embs = jax.lax.stop_gradient(words_embs)
        sent_emb = jax.lax.stop_gradient(sent_emb)
        pad_mask = captions == 0  # (B, T) True at padding (trainer.py:250)

        # ---- 2. generator forward, once, via vjp (trainer.py:255-257) ----
        z = jax.random.normal(rng_z, noise_shape(cfg, b), jnp.float32)

        def g_forward(g_params):
            (fakes, att, mu, logvar), mut = generator.apply(
                {"params": g_params, "batch_stats": state.g.batch_stats},
                z,
                sent_emb,
                words_embs,
                pad_mask,
                rng_ca,
                True,
                mutable=["batch_stats"],
            )
            return (tuple(fakes), mu, logvar), (att, mut["batch_stats"])

        # REMAT_GENERATOR: the G activation chain is the biggest residual
        # consumer in the step (measured: plain batch 128 HBM-thrashes).
        # mode 'full' keeps NO residuals (whole-G recompute; round-1
        # compile blew up at b128); mode 'stages' keeps only the
        # checkpoint_name-tagged stage boundaries (models/generator.py)
        # and recomputes within stages.
        if remat_generator:
            if remat_mode == "stages":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "g_stage")
                g_fwd = jax.checkpoint(g_forward, policy=policy)
            else:
                g_fwd = jax.checkpoint(g_forward)
        else:
            g_fwd = g_forward
        (fakes, mu, logvar), g_vjp, (_, g_new_bs) = jax.vjp(
            g_fwd, state.g.params, has_aux=True
        )

        # reals per D scale; the DCGAN variant has one D at the final scale.
        reals = imgs if len(fakes) == len(imgs) else (imgs[-1],)
        d_fakes = fakes if len(fakes) == len(imgs) else (fakes[-1],)

        # ---- 3. D updates on detached fakes (trainer.py:258-276) ----
        logs: Dict[str, jax.Array] = {}
        new_ds = []
        for i, (dmod, dstate) in enumerate(zip(discriminators, state.ds)):
            real_i = reals[i]
            fake_i = jax.lax.stop_gradient(d_fakes[i])

            def d_loss_fn(d_params, dmod=dmod, dstate=dstate, real_i=real_i, fake_i=fake_i):
                def inner(mod):
                    real_f = mod(real_i, True)
                    fake_f = mod(fake_i, True)
                    cond_real = bce_logits(mod.cond_logits(real_f, sent_emb, True), 1.0)
                    cond_fake = bce_logits(mod.cond_logits(fake_f, sent_emb, True), 0.0)
                    # wrong pair: image i vs caption i+1 (losses.py:148-150)
                    cond_wrong = bce_logits(
                        mod.cond_logits(
                            jax.tree.map(lambda a: a[: b - 1], real_f),
                            sent_emb[1:],
                            True,
                        ),
                        0.0,
                    )
                    if mod.uncond_head is not None:
                        real = bce_logits(mod.uncond_logits(real_f, True), 1.0)
                        fake = bce_logits(mod.uncond_logits(fake_f, True), 0.0)
                        return (real + cond_real) / 2.0 + (
                            fake + cond_fake + cond_wrong
                        ) / 3.0
                    return cond_real + (cond_fake + cond_wrong) / 2.0

                loss, mut = dmod.apply(
                    {"params": d_params, "batch_stats": dstate.batch_stats},
                    method=inner,
                    mutable=["batch_stats"],
                )
                return loss, mut["batch_stats"]

            (d_loss, new_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(dstate.params)
            updates, new_opt = d_tx.update(d_grads, dstate.opt_state, dstate.params)
            new_params = optax.apply_updates(dstate.params, updates)
            new_ds.append(NetState(new_params, new_bs, new_opt))
            logs[f"errD{i}"] = d_loss
        new_ds = tuple(new_ds)

        # ---- 4. G update against the *updated* Ds (trainer.py:278-296) ----
        match_labels = jnp.arange(b, dtype=jnp.int32)

        def g_loss_from_outputs(fakes, mu, logvar):
            glogs: Dict[str, jax.Array] = {}
            g_fakes = fakes if len(fakes) == len(imgs) else (fakes[-1],)
            total = jnp.float32(0.0)
            for i, (dmod, dstate) in enumerate(zip(discriminators, new_ds)):
                def head(mod, img):
                    f = mod(img, True)
                    l = bce_logits(mod.cond_logits(f, sent_emb, True), 1.0)
                    if mod.uncond_head is not None:
                        l = l + bce_logits(mod.uncond_logits(f, True), 1.0)
                    return l

                gl, _ = dmod.apply(
                    {"params": dstate.params, "batch_stats": dstate.batch_stats},
                    g_fakes[i],
                    method=head,
                    mutable=["batch_stats"],
                )
                glogs[f"g_loss{i}"] = gl
                total = total + gl

            if smooth_lambda == 0.0:
                # LAMBDA 0 drops the DAMSM terms from the graph entirely
                # (the reference would still run the dead encoder forward;
                # skipping it is pure win and gives perf ablations an
                # honest no-DAMSM operating point)
                kl = kl_loss(mu, logvar)
                glogs.update(w_loss=jnp.float32(0.0),
                             s_loss=jnp.float32(0.0), kl_loss=kl)
                return total + kl, glogs
            # DAMSM terms on the final scale (losses.py:185-200).  With
            # REMAT_IMAGE_ENCODER the frozen Inception forward is
            # rematerialized in the backward pass — its 299^2 activation
            # chain dominates peak HBM and recompute beats spilling when
            # the per-chip batch grows (donation is unavailable on this
            # runtime — see loop.py).  DAMSM_CHUNKS > 1 additionally runs
            # the encoder over sequential sub-batches (lax.map), dividing
            # peak activation memory by the chunk count.
            encode = lambda img: image_encoder.apply(state.image, img, False)
            if remat_image_encoder:
                if remat_encoder_mode == "blocks":
                    # Save the Mixed-block outputs (<= 35x35, tagged in
                    # models/inception.py) and recompute only the high-res
                    # stem: the stem's 299^2..71^2 activations are the HBM
                    # problem, the Mixed blocks are the recompute FLOPs.
                    encode = jax.checkpoint(
                        encode,
                        policy=jax.checkpoint_policies.save_only_these_names(
                            "enc_block"),
                    )
                elif remat_encoder_mode == "stem":
                    # Dual of 'blocks': save EVERYTHING except the
                    # 'enc_stem'-tagged high-res stem activations — the
                    # backward recomputes only the 299^2..71^2 stem
                    # (~0.9 TFLOP at b128) instead of the whole encoder
                    # (1.45 TFLOP).  Costs the Mixed-block residual memory
                    # that 'blocks'/'full' free; compose with BN_COMPACT
                    # for the headroom (VERDICT r3 next-#3).
                    encode = jax.checkpoint(
                        encode,
                        policy=jax.checkpoint_policies
                        .save_anything_except_these_names("enc_stem"),
                    )
                else:
                    encode = jax.checkpoint(encode)
            if damsm_chunks > 1:
                def encode_chunked(img, _enc=encode):
                    bsz = img.shape[0]
                    assert bsz % damsm_chunks == 0, (bsz, damsm_chunks)
                    chunks = img.reshape(
                        damsm_chunks, bsz // damsm_chunks, *img.shape[1:]
                    )
                    region_c, code_c = jax.lax.map(_enc, chunks)
                    return (
                        region_c.reshape(bsz, *region_c.shape[2:]),
                        code_c.reshape(bsz, code_c.shape[-1]),
                    )
                encode = encode_chunked
            region, code = encode(fakes[-1])
            if constrain is not None:
                region = constrain(region, ("data", None, "model"))
                code = constrain(code, ("data", "model"))
            w0, w1 = words_loss(
                region, words_embs, match_labels, cap_lens, class_ids,
                gamma1=gamma1, gamma2=gamma2, gamma3=gamma3,
                einsum_dtype=loss_dtype, grid_chunks=grid_chunks,
                impl=sim_impl, tile_i=sim_tile,
                fold_softmax=fold_softmax,
            )
            s0, s1 = sent_loss(code, sent_emb, match_labels, class_ids, gamma3=gamma3)
            w_loss = (w0 + w1) * smooth_lambda
            s_loss = (s0 + s1) * smooth_lambda
            kl = kl_loss(mu, logvar)
            glogs.update(w_loss=w_loss, s_loss=s_loss, kl_loss=kl)
            return total + w_loss + s_loss + kl, glogs

        (g_total, glogs), out_cts = jax.value_and_grad(
            g_loss_from_outputs, argnums=(0, 1, 2), has_aux=True
        )(fakes, mu, logvar)
        (g_grads,) = g_vjp(out_cts)

        updates, g_new_opt = g_tx.update(g_grads, state.g.opt_state, state.g.params)
        g_new_params = optax.apply_updates(state.g.params, updates)

        # ---- 5. EMA shadow (trainer.py:298-299) ----
        # Under GRAD_ACCUM > 1 the G update only commits every accum-th
        # micro-step; folding the unchanged params into the EMA on the
        # frozen micro-steps is a numeric no-op on the params but advances
        # the EMA 'age' (round-2 advisor deviation note) — gate the EMA on
        # the window commit so accumulation replays the reference's
        # per-update EMA cadence exactly.  accum == 1 -> always commits.
        if grad_accum > 1:
            committed = (state.step + 1) % grad_accum == 0
            g_new_ema = jax.tree.map(
                lambda folded, old: jnp.where(committed, folded, old),
                ema_update(state.g_ema, g_new_params, 0.999), state.g_ema,
            )
        else:
            g_new_ema = ema_update(state.g_ema, g_new_params, 0.999)

        logs.update(glogs)
        logs["errG"] = g_total
        new_state = state.replace(
            step=state.step + 1,
            g=NetState(g_new_params, g_new_bs, g_new_opt),
            g_ema=g_new_ema,
            ds=new_ds,
        )
        return new_state, logs

    return step


def make_gan_train_multistep(cfg, models: GANModels, n_steps: int,
                             mesh=None):
    """K train steps fused into ONE jitted program via ``lax.scan``.

    Dispatching K steps at once amortizes the runtime's per-dispatch
    overhead — a TPU-native feature with no reference analogue (the
    reference is an eager per-batch loop, trainer.py:238).  It pays off on
    low-latency runtimes; the tunneled flagship step here is compute-bound
    (~310 ms honest), so the default stays 1 (cfg.JAX.TRAIN_UNROLL).

    Signature: multistep(state, imgs, captions, cap_lens, class_ids, rng)
    where every batch input carries a leading (K, ...) axis and ``imgs`` is
    the usual per-branch tuple of (K, B, S, S, 3) arrays.  Returns
    (new_state, logs-of-last-step).  RNG decorrelation across the inner
    steps comes from the step's own fold_in on ``state.step``.
    """
    step = make_gan_train_step(cfg, models, mesh=mesh)

    def multistep(state, imgs, captions, cap_lens, class_ids, rng):
        def body(st, xs):
            im, cp, ln, ci = xs
            return step(st, im, cp, ln, ci, rng)

        state, logs = jax.lax.scan(
            body, state, (tuple(imgs), captions, cap_lens, class_ids),
            length=n_steps,
        )
        return state, jax.tree.map(lambda x: x[-1], logs)

    return multistep


def make_sample_fn(cfg, models: GANModels, use_ema: bool = True, train: bool = False):
    """Pure inference: (state, captions, cap_lens, rng) -> (fake_imgs, att).

    Mirrors the reference samplers (trainer.py:348-430 sampling /
    :432-518 gen_example), which swap the EMA weights in before generating
    (trainer.py:162-166 via save/load_params)."""
    generator = models.generator
    text_encoder = models.text_encoder

    def sample(state: GANTrainState, captions, cap_lens, rng):
        b = captions.shape[0]
        rng_z, rng_ca = jax.random.split(rng)
        z = jax.random.normal(rng_z, noise_shape(cfg, b), jnp.float32)
        return sample_with_noise(state, captions, cap_lens, z, rng_ca)

    def sample_with_noise(state: GANTrainState, captions, cap_lens, z, rng_ca):
        """Explicit-noise variant — the style-mixing gen_example feeds the
        same two z draws in both orders (trainer_bert.py:485-548)."""
        words_embs, sent_emb = text_encoder.apply(
            state.text, captions, cap_lens, train=False
        )
        pad_mask = captions == 0
        params = state.g_ema if use_ema else state.g.params
        fakes, att, _, _ = generator.apply(
            {"params": params, "batch_stats": state.g.batch_stats},
            z,
            sent_emb,
            words_embs,
            pad_mask,
            rng_ca,
            train,
            mutable=False,
        )
        return tuple(fakes), tuple(att)

    sample.with_noise = sample_with_noise
    return sample
