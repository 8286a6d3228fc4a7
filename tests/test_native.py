"""Native C++ host-op tests (vs cv2 / numpy references)."""

import numpy as np
import pytest

from freefine_tpu import native as N

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def test_native_builds():
    N._load()
    assert N.HAVE_NATIVE, "g++ build of native/host_ops.cpp failed"


def test_resize_nearest(rng_np):
    img = rng_np.integers(0, 255, (17, 23, 3)).astype(np.uint8)
    out = N.resize_nearest(img, 8, 8)
    assert out.shape == (8, 8, 3)
    ys = np.minimum((np.arange(8) * (17 / 8)).astype(int), 16)
    xs = np.minimum((np.arange(8) * (23 / 8)).astype(int), 22)
    np.testing.assert_array_equal(out, img[ys][:, xs])


def test_resize_nearest_mask_2d(rng_np):
    m = (rng_np.random((32, 32)) > 0.5).astype(np.uint8) * 255
    out = N.resize_nearest(m, 16, 16)
    assert out.shape == (16, 16)
    assert set(np.unique(out)) <= {0, 255}


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
def test_resize_bilinear_close_to_cv2(rng_np):
    img = rng_np.integers(0, 255, (33, 47, 3)).astype(np.uint8)
    out = N.resize_bilinear(img, 64, 64)
    want = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out.astype(int) - want.astype(int))
    assert np.median(diff) <= 1 and (diff <= 3).mean() > 0.97


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
@pytest.mark.parametrize("k", [3, 15, 30])
def test_dilate_matches_cv2(rng_np, k):
    m = (rng_np.random((48, 48)) > 0.92).astype(np.uint8)
    want = cv2.dilate(m, np.ones((k, k), np.uint8)) * 255
    got = N.dilate(m, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
def test_erode_matches_cv2(rng_np):
    m = (rng_np.random((48, 48)) > 0.3).astype(np.uint8)
    want = cv2.erode(m, np.ones((5, 5), np.uint8)) * 255
    got = N.erode(m, 5)
    # cv2 erode treats out-of-image as within (border replicate 255);
    # compare interior only
    np.testing.assert_array_equal(got[3:-3, 3:-3], want[3:-3, 3:-3])


def test_normalize(rng_np):
    img = rng_np.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    out = N.normalize_to_f32(img)
    np.testing.assert_allclose(out, img.astype(np.float32) / 127.5 - 1, atol=1e-6)


def test_masked_l1_matches_wrap_error(rng_np):
    from freefine_tpu.metrics.wrap_error import wrap_error_single

    a = rng_np.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    b = rng_np.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    m = (rng_np.random((32, 32)) > 0.5).astype(np.uint8) * 255
    np.testing.assert_allclose(
        N.masked_l1(a, b, m), wrap_error_single(a, b, m), rtol=1e-9
    )
