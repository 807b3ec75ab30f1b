from sba_gan_tpu.evaluation.fid import (
    activation_stats,
    frechet_distance,
    make_activation_fn,
)
from sba_gan_tpu.evaluation.inception_score import (
    InceptionV3Classifier,
    inception_score,
    inception_score_from_probs,
    load_images_from_dir,
    make_predict_fn,
)
from sba_gan_tpu.evaluation.r_precision import r_precision_from_codes

__all__ = [
    "InceptionV3Classifier",
    "activation_stats",
    "frechet_distance",
    "inception_score",
    "inception_score_from_probs",
    "load_images_from_dir",
    "make_activation_fn",
    "make_predict_fn",
    "r_precision_from_codes",
]
