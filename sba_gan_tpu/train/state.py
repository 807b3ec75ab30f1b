"""Train-state pytrees and optimizer constructors.

The reference keeps per-network torch ``optim.Adam`` objects
(AttnGAN2/code/trainer.py:132-145) and EMA generator weights held as a plain
parameter list (trainer.py:68-70, 298-299).  Here every piece of mutable
training state — parameters, batch-norm statistics, optimizer moments, EMA
shadow, step counter — lives in one immutable pytree so a whole train step is
a single pure jitted function over the device mesh.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class NetState(struct.PyTreeNode):
    """One network's mutable state: params + BN stats + optimizer moments."""

    params: Any
    batch_stats: Any
    opt_state: Any


class GANTrainState(struct.PyTreeNode):
    """Full GAN training state (reference trainer holds these as attributes
    of condGANTrainer; trainer.py:48-157)."""

    step: jax.Array  # scalar int32
    g: NetState
    g_ema: Any  # EMA shadow of g.params (reference avg_param, trainer.py:70)
    ds: Tuple[NetState, ...]  # one per scale
    text: Any  # frozen text-encoder variables {'params': ...}
    image: Any  # frozen image-encoder variables {'params','batch_stats'}


class DAMSMTrainState(struct.PyTreeNode):
    """DAMSM pretraining state: joint text-encoder + image-projection update
    (reference pretrain_DAMSM.py:166-192)."""

    step: jax.Array
    text_params: Any
    image_params: Any
    image_batch_stats: Any
    opt_state: Any


def make_gan_adam(lr: float, grad_accum: int = 1):
    """Adam with the reference GAN hyperparameters (trainer.py:132-145):
    lr 2e-4, betas (0.5, 0.999).  grad_accum > 1 wraps the optimizer in
    optax.MultiSteps — micro-batches accumulate and the update applies every
    `grad_accum` steps, keeping the reference's small effective batch when
    data parallelism multiplies the global batch (SURVEY.md hard-part #6).

    deviation (GRAD_ACCUM_MODE='window'): within an accumulation window
    the GAN dynamics differ from the reference's per-batch alternation —
    D params are FROZEN during micro-steps (updates apply every k-th
    step), so G's update inside a window sees the window-start Ds rather
    than freshly-updated ones.  Equivalent to the reference only at
    GRAD_ACCUM=1; with accumulation it is large-batch adversarial training
    with the reference's *effective* batch.  GRAD_ACCUM_MODE='dfresh'
    removes the D half of the deviation (D updates every micro-batch, see
    gan_optimizers), and the EMA now commits exactly once per G window in
    both modes (train/gan.py)."""
    tx = optax.adam(lr, b1=0.5, b2=0.999, eps=1e-8)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def gan_optimizers(cfg):
    """The (g_tx, d_tx) pair; used by both state init and the train step so
    optimizer-state pytrees always match.

    GRAD_ACCUM_MODE:
      'window' — both G and D accumulate over the window (large-batch
        adversarial training at the reference's effective batch; the
        round-2 documented deviation).
      'dfresh' — only G accumulates; every D updates on every micro-batch
        exactly as the reference alternation does (trainer.py:258-276), so
        G's committed update sees Ds trained on all K micro-batches — the
        reference-faithful option when accumulation is load-bearing for
        the small-batch IS-parity story (SURVEY hard-part #6)."""
    accum = cfg.TRAIN.GRAD_ACCUM
    d_accum = accum if cfg.TRAIN.GRAD_ACCUM_MODE == "window" else 1
    return (
        make_gan_adam(cfg.TRAIN.GENERATOR_LR, accum),
        make_gan_adam(cfg.TRAIN.DISCRIMINATOR_LR, d_accum),
    )


def make_damsm_optimizer(
    lr: jax.Array | float, grad_clip: float
) -> optax.GradientTransformation:
    """DAMSM pretraining optimizer (pretrain_DAMSM.py:270, 96-97): Adam
    (betas 0.5/0.999) with grad-norm clip.  The reference clips only the RNN
    parameters; the clip here is applied per-subtree by the caller masking
    gradients, so the transformation itself is unconditional."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lr, b1=0.5, b2=0.999, eps=1e-8),
    )


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    """avg_p = decay*avg_p + (1-decay)*p (reference trainer.py:298-299,
    mul_(0.999).add_(0.001, p.data))."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )
