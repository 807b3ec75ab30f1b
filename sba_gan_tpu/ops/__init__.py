from sba_gan_tpu.ops.damsm_sim import damsm_sim
from sba_gan_tpu.ops.word_attention import word_attention

__all__ = ["damsm_sim", "word_attention"]
