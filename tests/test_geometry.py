"""2D coarse-edit op tests vs cv2.warpAffine ground truth."""

import numpy as np
import pytest

from freefine_tpu.ops import geometry as G

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@pytest.fixture
def scene(rng_np):
    img = rng_np.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[20:36, 24:40] = 255
    return img, mask


def _cv2_matrix(mask, dx, dy, rot, sx, sy):
    cx, cy = G.mask_bbox_center(mask)
    m = cv2.getRotationMatrix2D((cx, cy), -rot, 1)
    tx, ty = (1 - sx) * cx, (1 - sy) * cy
    m[0, 2] += dx + tx
    m[1, 2] += dy + ty
    m[0, 0] *= sx
    m[1, 1] *= sy
    return m


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
@pytest.mark.parametrize(
    "dx,dy,rot,sx,sy",
    [(10, -5, 0, 1, 1), (0, 0, 30, 1, 1), (0, 0, 0, 1.5, 0.8), (8, 4, 15, 1.2, 1.2)],
)
def test_matrix_matches_cv2(scene, dx, dy, rot, sx, sy):
    _, mask = scene
    ours = G.edit_affine_matrix(G.mask_bbox_center(mask), dx, dy, rot, sx, sy)
    want = _cv2_matrix(mask, dx, dy, rot, sx, sy)
    np.testing.assert_allclose(ours, want, atol=1e-6)


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
def test_warp_mask_matches_cv2(scene):
    img, mask = scene
    m = _cv2_matrix(mask, 6, 3, 20, 1.1, 0.9)
    want = cv2.warpAffine(
        (mask > 0).astype(np.uint8), m, (64, 64), flags=cv2.INTER_NEAREST
    )
    import jax.numpy as jnp

    inv = jnp.asarray(G.invert_affine(m), jnp.float32)
    got = np.asarray(
        G.warp_affine(jnp.asarray((mask > 0).astype(np.uint8)), inv, method="nearest")
    )
    # Nearest-neighbour ties at exact .5 boundaries may differ by a pixel;
    # demand >= 99% agreement.
    agree = (got > 0) == (want > 0)
    assert agree.mean() > 0.99, agree.mean()


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
def test_warp_image_close_to_cv2(scene):
    img, mask = scene
    m = _cv2_matrix(mask, 6, 3, 20, 1.0, 1.0)
    want = cv2.warpAffine(img, m, (64, 64)).astype(np.float32)
    import jax.numpy as jnp

    inv = jnp.asarray(G.invert_affine(m), jnp.float32)
    got = np.asarray(G.warp_affine(jnp.asarray(img), inv))
    # interior pixels (away from the zero-padding boundary) must agree
    # closely under bilinear interpolation
    diff = np.abs(got - want)[5:-5, 5:-5]
    assert np.median(diff) < 1.0
    assert (diff < 2.0).mean() > 0.95


def test_re_edit_2d_translation(scene):
    img, mask = scene
    final, tmask, hole = G.re_edit_2d(img, mask, dx=10, dy=0)
    assert final.shape == img.shape and tmask.shape == mask.shape
    assert tmask.dtype == np.uint8 and set(np.unique(tmask)) <= {0, 255}
    # mask moved right by 10
    ys, xs = np.where(tmask > 0)
    ys0, xs0 = np.where(mask > 0)
    assert abs(xs.min() - (xs0.min() + 10)) <= 1
    assert abs(ys.min() - ys0.min()) <= 1
    # outside both masks, final == background (img)
    outside = (mask == 0) & (tmask == 0)
    np.testing.assert_array_equal(final[outside], img[outside])
    # hole image zeroed in the original mask (minus the moved object)
    hole_region = (mask > 0) & (tmask == 0)
    assert (hole[hole_region] == 0).all()


def test_re_edit_2d_9param(scene):
    img, mask = scene
    p9 = [5, 0, 0, 0, 0, 10, 1.1, 1.1, 1]
    final, tmask, _ = G.re_edit_2d(img, mask, edit_param=p9)
    final5, tmask5, _ = G.re_edit_2d(
        img, mask, dx=5, dy=0, rotation=10, scale_x=1.1, scale_y=1.1
    )
    np.testing.assert_array_equal(final, final5)
    np.testing.assert_array_equal(tmask, tmask5)


def test_flip_object(scene):
    img, mask = scene
    final, tmask = G.flip_object(img, mask, horizontal=True)
    ys0, xs0 = np.where(mask > 0)
    ys, xs = np.where(tmask > 0)
    cx = (xs0.min() + xs0.max()) / 2
    assert abs(((xs.min() + xs.max()) / 2) - cx) <= 1
    np.testing.assert_array_equal(sorted(np.unique(ys)), sorted(np.unique(ys0)))
