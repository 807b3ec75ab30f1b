from sba_gan_tpu.losses.damsm import sent_loss, words_loss
from sba_gan_tpu.losses.gan import (
    bce_logits,
    discriminator_loss,
    generator_loss,
    kl_loss,
)

__all__ = [
    "sent_loss",
    "words_loss",
    "bce_logits",
    "discriminator_loss",
    "generator_loss",
    "kl_loss",
]
