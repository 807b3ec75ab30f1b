from sba_gan_tpu.models.attention import WordAttention, damsm_attention
from sba_gan_tpu.models.blocks import (
    AdaINNorm,
    CANet,
    MappingNet,
    ResBlock,
    UpBlock,
    glu,
)
from sba_gan_tpu.models.discriminator import (
    DNet64,
    DNet128,
    DNet256,
    build_discriminators,
)
from sba_gan_tpu.models.generator import GDCGAN, GNet, build_generator
from sba_gan_tpu.models.text_rnn import RNNEncoder
