"""sba_gan_tpu — a TPU-native (JAX/Flax/pjit/Pallas) re-build of the
SBA-GAN text-to-image framework (reference: zhengfei0908/SBA-GAN).

Capabilities: DAMSM text-image matching pretraining (bi-LSTM / BERT text
encoders + Inception-v3 image encoder), the multi-stage attentional
generator with AdaIN style injection and style mixing, per-scale
discriminators, single-jit GAN training over a device mesh, sampling /
Inception-Score evaluation, attention visualization, and a serving API.
"""

__version__ = "0.1.0"

from sba_gan_tpu.config import ConfigDict, cfg_from_dict, cfg_from_file, default_config

__all__ = [
    "ConfigDict",
    "cfg_from_dict",
    "cfg_from_file",
    "default_config",
]
