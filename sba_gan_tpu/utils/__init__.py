from sba_gan_tpu.utils.image import (
    make_grid,
    mkdir_p,
    save_image,
    to_uint8,
)
from sba_gan_tpu.utils.viz import build_super_images, build_super_images2

__all__ = [
    "make_grid",
    "mkdir_p",
    "save_image",
    "to_uint8",
    "build_super_images",
    "build_super_images2",
]
