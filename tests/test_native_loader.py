"""Native C++ loader tests: build, decode/crop/flip/resize correctness vs a
PIL reference on generated JPEGs."""

import os

import numpy as np
import pytest
from PIL import Image

from sba_gan_tpu.data.native_loader import NativeImageLoader

pytestmark = pytest.mark.skipif(
    not NativeImageLoader.available(), reason="native toolchain/libjpeg missing"
)


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth image so JPEG loss and resampler differences stay small
    x = np.linspace(0, 255, 64, dtype=np.float32)
    img = np.stack(np.meshgrid(x, x), -1).sum(-1) / 2
    arr = np.stack([img, img[::-1], img.T], -1).astype(np.uint8)
    path = str(tmp / "t.jpg")
    Image.fromarray(arr).save(path, quality=95)
    return path, arr


def test_decode_and_normalize(jpeg):
    path, arr = jpeg
    loader = NativeImageLoader()
    (out,) = loader.load(path, sizes=[64])
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    ref = np.asarray(Image.open(path), np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=0.02)


def test_resize_matches_pil_closely(jpeg):
    path, _ = jpeg
    loader = NativeImageLoader()
    (out,) = loader.load(path, sizes=[32])
    pil = Image.open(path).resize((32, 32), Image.BILINEAR)
    ref = np.asarray(pil, np.float32) / 127.5 - 1.0
    # different bilinear conventions: close but not bit-exact
    assert np.mean(np.abs(out - ref)) < 0.05


def test_bbox_crop_and_flip(jpeg):
    path, arr = jpeg
    loader = NativeImageLoader()
    (crop,) = loader.load(path, sizes=[16], bbox=(8, 8, 16, 16))
    ref = np.asarray(Image.open(path), np.float32)[8:24, 8:24] / 127.5 - 1.0
    np.testing.assert_allclose(crop, ref, atol=0.02)

    (flipped,) = loader.load(path, sizes=[64], hflip=True)
    (plain,) = loader.load(path, sizes=[64], hflip=False)
    np.testing.assert_allclose(flipped, plain[:, ::-1], atol=1e-6)


def test_multiscale_and_pipeline(jpeg):
    path, _ = jpeg
    loader = NativeImageLoader()
    outs = loader.load(path, sizes=[16, 32, 64], pre_size=76,
                       crop2=(6, 6, 64, 64))
    assert [o.shape[0] for o in outs] == [16, 32, 64]
    for o in outs:
        assert np.isfinite(o).all()


def test_missing_file_raises():
    loader = NativeImageLoader()
    with pytest.raises(IOError):
        loader.load("/nonexistent/file.jpg", sizes=[8])
