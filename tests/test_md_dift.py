"""MD metric + DIFT correspondence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.metrics.md import (
    mean_distance_single,
    sift_keypoints_in_mask,
    transform_coordinates,
)
from freefine_tpu.ops.dift import match_points

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def test_transform_coords_translate():
    gt = transform_coordinates([5, -3, 0, 0, 0, 0, 1, 1, 1], (8, 8),
                               np.ones((8, 8)))
    # row shifts by dy=-3, col by dx=5 (mean_distance.py:85-88)
    np.testing.assert_allclose(gt[2, 2], [2 - 3, 2 + 5])


def test_transform_coords_scale_center_fixed():
    mask = np.zeros((16, 16))
    mask[6:10, 6:10] = 1
    gt = transform_coordinates([0, 0, 0, 0, 0, 0, 2.0, 2.0, 1], (16, 16), mask)
    # the mask's center of mass maps to itself
    np.testing.assert_allclose(gt[7, 7], [7.5 - 0.5 * 1, 7.5 - 0.5 * 1], atol=1.0)
    # a point offset from center doubles its offset
    c = 7.5
    got = gt[10, 10]
    np.testing.assert_allclose(got, [c + 2 * (10 - c), c + 2 * (10 - c)], atol=1e-6)


def test_mean_distance_zero_for_exact_match():
    gt = transform_coordinates([3, 0, 0, 0, 0, 0, 1, 1, 1], (8, 8), np.ones((8, 8)))
    kps = np.array([[2, 2], [4, 4]])
    matched = np.array([[2, 5], [4, 7]])  # moved right by 3
    d = mean_distance_single(matched, kps, gt)
    np.testing.assert_allclose(d, 0.0, atol=1e-9)


def test_match_points_recovers_shift(rng_np):
    """Shift a random feature map; matching must recover the shift."""
    f = jnp.asarray(rng_np.normal(size=(12, 12, 16)).astype(np.float32))
    shifted = jnp.roll(f, shift=(2, 3), axis=(0, 1))
    pts = jnp.asarray([[4, 4], [6, 2]])
    got = np.asarray(match_points(f, shifted, pts))
    np.testing.assert_array_equal(got, [[6, 7], [8, 5]])


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
def test_sift_keypoints_in_mask(rng_np):
    img = (rng_np.random((64, 64, 3)) * 255).astype(np.uint8)
    img[20:40, 20:40] = 255  # strong corners
    img[24:36, 24:36] = 0
    mask = np.zeros((64, 64))
    mask[16:44, 16:44] = 1
    kps = sift_keypoints_in_mask(img, img, mask, max_points=10)
    assert kps.shape[1] == 2 and len(kps) >= 1
    assert all(mask[r, c] > 0.5 for r, c in kps)
