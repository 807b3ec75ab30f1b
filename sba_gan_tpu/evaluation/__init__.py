from sba_gan_tpu.evaluation.inception_score import (
    InceptionV3Classifier,
    inception_score,
    inception_score_from_probs,
    load_images_from_dir,
    make_predict_fn,
)

__all__ = [
    "InceptionV3Classifier",
    "inception_score",
    "inception_score_from_probs",
    "load_images_from_dir",
    "make_predict_fn",
]
