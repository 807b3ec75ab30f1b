from sba_gan_tpu.ops.damsm_sim import damsm_sim
from sba_gan_tpu.ops.norms import bn_train_apply, instance_norm_train_apply
from sba_gan_tpu.ops.word_attention import word_attention

__all__ = ["bn_train_apply", "damsm_sim", "instance_norm_train_apply",
           "word_attention"]
