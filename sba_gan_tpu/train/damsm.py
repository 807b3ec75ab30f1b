"""DAMSM pretraining: joint text-encoder + image-projection training.

Capability parity with the reference pretrain scripts
(AttnGAN2/code/pretrain_DAMSM.py:49-296 and pretrain_DAMSM_bert.py):

* joint words+sent loss in both directions (pretrain_DAMSM.py:82-94),
* grad clip 0.25 on the text-encoder parameters only (:96-97),
* lr decay x0.98 per epoch with floor lr/10, and the reference's quirk of
  re-building Adam each epoch — moments reset — is reproduced by
  :func:`epoch_lr` + :meth:`reset_optimizer` (:269-284),
* image-encoder freezing at the optimizer level: only the projection heads
  train (model.py:170-174); the BERT variant also unfreezes Mixed_7a/7b/7c
  (model_bert.py:227-230) — here a gradient mask, not mutable module state.

TPU-first: one jitted step, batch sharded over the ``data`` mesh axis; the
batched words_loss replaces the reference's per-sample Python loop
(SURVEY.md hard-part #1).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from sba_gan_tpu.losses.damsm import sent_loss, words_loss
from sba_gan_tpu.models.inception import CNNEncoder
from sba_gan_tpu.train.gan import build_text_encoder
from sba_gan_tpu.train.state import DAMSMTrainState


class DAMSMModels(NamedTuple):
    text_encoder: nn.Module
    image_encoder: nn.Module


def build_damsm_models(cfg, n_words: int) -> DAMSMModels:
    return DAMSMModels(
        text_encoder=build_text_encoder(cfg, n_words),
        image_encoder=CNNEncoder(
            nef=cfg.TEXT.EMBEDDING_DIM,
            input_size=cfg.MODEL.INCEPTION_INPUT,
            dtype=jnp.dtype(cfg.JAX.DTYPE),
        ),
    )


def image_trainable_mask(image_params: Any, unfreeze_mixed7: bool = False) -> Any:
    """True where an image-encoder parameter trains.  Projection heads only
    (reference model.py:170-174); +Mixed_7a/7b/7c in the BERT variant
    (model_bert.py:227-230)."""

    def mask_tree(tree, trainable):
        return jax.tree.map(lambda _: trainable, tree)

    out = {}
    for k, v in image_params.items():
        if k in ("emb_features", "emb_cnn_code"):
            out[k] = mask_tree(v, True)
        elif k == "backbone":
            out[k] = {
                bk: mask_tree(bv, unfreeze_mixed7 and bk in ("Mixed_7a", "Mixed_7b", "Mixed_7c"))
                for bk, bv in v.items()
            }
        else:
            out[k] = mask_tree(v, False)
    return out


def epoch_lr(base_lr: float, epoch: int, decay: float = 0.98) -> float:
    """Reference lr schedule (pretrain_DAMSM.py:283-284): multiply by 0.98
    each epoch while above base_lr/10."""
    lr = base_lr
    for _ in range(epoch):
        if lr > base_lr / 10.0:
            lr *= decay
    return lr


class DAMSMTrainer:
    """Owns the optimizers + jitted step; host code drives epochs."""

    def __init__(self, cfg, models: DAMSMModels, n_words: int):
        self.cfg = cfg
        self.models = models
        self.n_words = n_words
        self.grad_clip = cfg.TRAIN.RNN_GRAD_CLIP
        self.base_lr = cfg.TRAIN.ENCODER_LR
        self.unfreeze_mixed7 = cfg.MODEL.TEXT_ENCODER == "bert"
        self._text_tx = optax.chain(
            optax.clip_by_global_norm(self.grad_clip),
            optax.inject_hyperparams(optax.adam)(
                learning_rate=self.base_lr, b1=0.5, b2=0.999
            ),
        )
        self._image_tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.base_lr, b1=0.5, b2=0.999
        )
        self.train_step = jax.jit(self._make_step(train=True))
        self.eval_step = jax.jit(self._make_step(train=False))

    # ---- state management -------------------------------------------------
    def init_state(self, rng: jax.Array, init_batch: int = 2) -> DAMSMTrainState:
        cfg = self.cfg
        r_text, r_img, r_drop = jax.random.split(rng, 3)
        t = cfg.TEXT.WORDS_NUM
        captions = jnp.ones((init_batch, t), jnp.int32)
        cap_lens = jnp.full((init_batch,), t, jnp.int32)
        text_vars = self.models.text_encoder.init(
            {"params": r_text, "dropout": r_drop}, captions, cap_lens, train=False
        )
        size = cfg.MODEL.INCEPTION_INPUT
        image_vars = self.models.image_encoder.init(
            r_img, jnp.zeros((init_batch, size, size, 3), jnp.float32), True
        )
        return DAMSMTrainState(
            step=jnp.zeros((), jnp.int32),
            text_params=text_vars["params"],
            image_params=image_vars["params"],
            image_batch_stats=image_vars.get("batch_stats", {}),
            opt_state=(
                self._text_tx.init(text_vars["params"]),
                self._image_tx.init(image_vars["params"]),
            ),
        )

    def reset_optimizer(self, state: DAMSMTrainState, epoch: int) -> DAMSMTrainState:
        """Reference re-creates Adam with the decayed lr every epoch
        (pretrain_DAMSM.py:269-284), resetting the moments; reproduce both."""
        lr = epoch_lr(self.base_lr, epoch)
        text_opt = self._text_tx.init(state.text_params)
        image_opt = self._image_tx.init(state.image_params)
        text_opt[1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        image_opt.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state.replace(opt_state=(text_opt, image_opt))

    # ---- step -------------------------------------------------------------
    def _make_step(self, train: bool):
        cfg = self.cfg
        gamma1 = cfg.TRAIN.SMOOTH.GAMMA1
        gamma2 = cfg.TRAIN.SMOOTH.GAMMA2
        gamma3 = cfg.TRAIN.SMOOTH.GAMMA3
        loss_dtype = (jnp.bfloat16 if cfg.JAX.LOSS_DTYPE == "bfloat16"
                      else jnp.float32)
        text_encoder = self.models.text_encoder
        image_encoder = self.models.image_encoder
        text_tx, image_tx = self._text_tx, self._image_tx
        unfreeze_mixed7 = self.unfreeze_mixed7

        enc_chunks = cfg.JAX.DAMSM_CHUNKS
        remat_enc = cfg.JAX.REMAT_IMAGE_ENCODER
        remat_enc_mode = cfg.JAX.REMAT_IMAGE_ENCODER_MODE

        def losses_fn(text_params, image_params, batch_stats, img, captions,
                      cap_lens, class_ids, rng):
            b = captions.shape[0]
            labels = jnp.arange(b, dtype=jnp.int32)
            if train:
                # Freeze the trunk INSIDE the graph: stop_gradient on the
                # frozen parameter leaves lets XLA dead-code-eliminate the
                # whole trunk backward (dgrad+wgrad at 299^2 — the bulk of
                # the step; the images are data, so nothing upstream needs
                # their gradient either).  The reference reaches the same
                # trained state by masking grads after a full backward
                # (requires_grad=False, model.py:170-174); grads here are
                # bit-identical (exact zeros on frozen leaves) with the
                # backward cost removed.
                mask = image_trainable_mask(image_params, unfreeze_mixed7)
                image_params = jax.tree.map(
                    lambda p, m: p if m else jax.lax.stop_gradient(p),
                    image_params, mask,
                )
                enc = lambda bs, im: _apply_image(
                    image_encoder, image_params, bs, im, True
                )
                if remat_enc:
                    # Same remat modes as the GAN step (train/gan.py):
                    # numerics-identical; trades recompute for residual HBM
                    # (with the trunk frozen the recompute is mostly DCE'd,
                    # so this is nearly free insurance at large batches).
                    if remat_enc_mode == "blocks":
                        policy = jax.checkpoint_policies.save_only_these_names(
                            "enc_block")
                        enc = jax.checkpoint(enc, policy=policy)
                    elif remat_enc_mode == "stem":
                        policy = (jax.checkpoint_policies
                                  .save_anything_except_these_names("enc_stem"))
                        enc = jax.checkpoint(enc, policy=policy)
                    else:
                        enc = jax.checkpoint(enc)
                if enc_chunks > 1:
                    # Large-batch lever (VERDICT r4 #6: b512 regressed 3.2x
                    # for 2x batch — the 299^2..71^2 train-mode encoder
                    # activations thrash HBM).  lax.scan over sequential
                    # sub-batches divides the forward peak by the chunk
                    # count and threads the BN running stats through in
                    # order.  Deliberate deviation: train-mode batch-norm
                    # STATISTICS are computed per sub-batch (equivalent to
                    # running N sequential smaller batches), not over the
                    # full batch — document, don't hide; default stays 1.
                    assert b % enc_chunks == 0, (b, enc_chunks)
                    im_c = img.reshape(enc_chunks, b // enc_chunks,
                                       *img.shape[1:])

                    def body(bs, im, _enc=enc):
                        r, c, bs2 = _enc(bs, im)
                        return bs2, (r, c)

                    mut, (region_c, code_c) = jax.lax.scan(body, batch_stats,
                                                           im_c)
                    region = region_c.reshape(b, *region_c.shape[2:])
                    code = code_c.reshape(b, code_c.shape[-1])
                else:
                    region, code, mut = enc(batch_stats, img)
            else:
                region, code = image_encoder.apply(
                    {"params": image_params, "batch_stats": batch_stats},
                    img, False,
                )
                mut = batch_stats
            words_emb, sent_emb = text_encoder.apply(
                {"params": text_params}, captions, cap_lens, train=train,
                rngs={"dropout": rng} if train else None,
            )
            w0, w1 = words_loss(
                region, words_emb, labels, cap_lens, class_ids,
                gamma1=gamma1, gamma2=gamma2, gamma3=gamma3,
                einsum_dtype=loss_dtype, impl=cfg.JAX.DAMSM_SIM_IMPL,
                tile_i=cfg.JAX.DAMSM_SIM_TILE,
                fold_softmax=cfg.JAX.DAMSM_FOLD_SOFTMAX,
            )
            s0, s1 = sent_loss(code, sent_emb, labels, class_ids, gamma3=gamma3)
            total = w0 + w1 + s0 + s1
            logs = {"w_loss0": w0, "w_loss1": w1, "s_loss0": s0, "s_loss1": s1,
                    "total": total}
            return total, (logs, mut)

        if not train:
            def eval_step(state: DAMSMTrainState, img, captions, cap_lens, class_ids):
                _, (logs, _) = losses_fn(
                    state.text_params, state.image_params,
                    state.image_batch_stats, img, captions, cap_lens,
                    class_ids, jax.random.PRNGKey(0),
                )
                return logs
            return eval_step

        def step(state: DAMSMTrainState, img, captions, cap_lens, class_ids, rng):
            rng = jax.random.fold_in(rng, state.step)
            (_, (logs, new_bs)), grads = jax.value_and_grad(
                losses_fn, argnums=(0, 1), has_aux=True
            )(
                state.text_params, state.image_params, state.image_batch_stats,
                img, captions, cap_lens, class_ids, rng,
            )
            text_grads, image_grads = grads
            # Trunk freeze (model.py:170-174): losses_fn's stop_gradient
            # already makes frozen-leaf grads exact zeros (and removes the
            # trunk backward from the graph); the explicit mask here is
            # free insurance (XLA DCEs zeros_like of zeros) in case the
            # in-graph mask ever drifts from this one.
            mask = image_trainable_mask(state.image_params, unfreeze_mixed7)
            image_grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), image_grads, mask
            )
            text_opt, image_opt = state.opt_state
            t_updates, text_opt = text_tx.update(text_grads, text_opt, state.text_params)
            i_updates, image_opt = image_tx.update(image_grads, image_opt, state.image_params)
            return state.replace(
                step=state.step + 1,
                text_params=optax.apply_updates(state.text_params, t_updates),
                image_params=optax.apply_updates(state.image_params, i_updates),
                image_batch_stats=new_bs,
                opt_state=(text_opt, image_opt),
            ), logs

        return step


def _apply_image(image_encoder, params, batch_stats, img, train):
    (region, code), mut = image_encoder.apply(
        {"params": params, "batch_stats": batch_stats},
        img, train, mutable=["batch_stats"],
    )
    return region, code, mut["batch_stats"]
