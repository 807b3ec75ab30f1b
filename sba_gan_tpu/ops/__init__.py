from sba_gan_tpu.ops.word_attention import word_attention

__all__ = ["word_attention"]
