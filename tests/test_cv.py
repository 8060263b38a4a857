"""Native CV preprocessing tests vs numpy references."""

import numpy as np
import pytest

from paddle_lite_tpu import cv


def test_bgr_to_rgb(rng):
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    out = cv.bgr_to_rgb(img)
    np.testing.assert_array_equal(out, img[:, :, ::-1])


def test_resize_identity(rng):
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    out = cv.resize(img, 8, 8)
    np.testing.assert_array_equal(out, img)


def test_resize_downscale_close_to_mean(rng):
    img = np.zeros((4, 4, 1), np.uint8)
    img[:2] = 100
    img[2:] = 200
    out = cv.resize(img, 2, 2)
    assert out.shape == (2, 2, 1)
    assert 90 <= out[0, 0, 0] <= 110 and 190 <= out[1, 1, 0] <= 210


def test_rotate_flip(rng):
    img = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(cv.rotate(img, 90), np.rot90(img, k=-1))
    np.testing.assert_array_equal(cv.rotate(img, 180), np.rot90(img, k=2))
    np.testing.assert_array_equal(cv.rotate(img, 270), np.rot90(img, k=1))
    np.testing.assert_array_equal(cv.flip(img, 0), img[::-1])
    np.testing.assert_array_equal(cv.flip(img, 1), img[:, ::-1])
    np.testing.assert_array_equal(cv.flip(img, -1), img[::-1, ::-1])


def test_nv12_gray():
    # flat gray: Y=128, U=V=128 -> R=G=B=128
    h, w = 4, 4
    y = np.full((h, w), 128, np.uint8)
    uv = np.full((h // 2, w), 128, np.uint8)
    rgb = cv.nv_to_rgb(y, uv, h, w)
    assert rgb.shape == (h, w, 3)
    np.testing.assert_array_equal(rgb, np.full((h, w, 3), 128, np.uint8))


def test_to_tensor(rng):
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = cv.to_tensor(img, mean, std)
    ref = (img.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_to_tensor_validates_channels(rng):
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="entries"):
        cv.to_tensor(img, mean=(0.5,), std=(1.0,))
