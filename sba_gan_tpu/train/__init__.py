from sba_gan_tpu.train.gan import (
    GANModels,
    build_models,
    build_text_encoder,
    branch_sizes,
    init_gan_state,
    make_gan_train_multistep,
    make_gan_train_step,
    make_sample_fn,
)
from sba_gan_tpu.train.state import (
    DAMSMTrainState,
    GANTrainState,
    NetState,
    ema_update,
    gan_optimizers,
    make_damsm_optimizer,
    make_gan_adam,
)

__all__ = [
    "GANModels",
    "build_models",
    "build_text_encoder",
    "branch_sizes",
    "init_gan_state",
    "make_gan_train_multistep",
    "make_gan_train_step",
    "make_sample_fn",
    "DAMSMTrainState",
    "GANTrainState",
    "NetState",
    "ema_update",
    "make_damsm_optimizer",
    "gan_optimizers",
    "make_gan_adam",
]
