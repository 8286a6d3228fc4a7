"""3D point-splatting tests: identity round-trip, translation, occlusion."""

import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.ops import point_splat as PS

H = W = 64
FX = FY = 80.0


@pytest.fixture
def scene(rng_np):
    img = rng_np.integers(40, 255, (H, W, 3)).astype(np.uint8)
    mask = np.zeros((H, W), np.uint8)
    mask[24:40, 20:36] = 1
    depth = np.full((H, W), 5.0, np.float32)
    return img, mask, depth


def test_euler_matrix_z90():
    r = np.asarray(PS.euler_xyz_matrix(jnp.float32(0), jnp.float32(0), jnp.deg2rad(90.0)))
    # p @ Rz(90): x-axis -> (0, -1)? Rz = [[0,-1,0],[1,0,0],[0,0,1]];
    # [1,0,0] @ Rz = [0,-1,0]
    np.testing.assert_allclose(np.array([1.0, 0, 0]) @ r, [0, -1, 0], atol=1e-6)


def test_identity_transform_roundtrip(scene):
    """Identity transform must reproduce the object pixels exactly."""
    img, mask, depth = scene
    final, tmask, _ = PS.re_edit_3d_depth(
        img, mask, depth, [0, 0, 0, 0, 0, 0, 1, 1, 1],
        focal_length_x=FX, focal_length_y=FY,
    )
    obj = mask > 0
    assert (tmask[obj] > 0).mean() > 0.98
    diff = np.abs(final[obj].astype(float) - img[obj].astype(float))
    assert np.median(diff) < 2.0, np.median(diff)
    # background untouched outside the rendered mask
    bg = (~obj) & (tmask == 0)
    np.testing.assert_array_equal(final[bg], img[bg])


def test_translation_moves_object(scene):
    """dx=0.5 relative -> object shifts by ~half its width (in -x after the
    opencv->p3d flip, i.e. LEFT in pixels)."""
    img, mask, depth = scene
    _, tmask, _ = PS.re_edit_3d_depth(
        img, mask, depth, [0.5, 0, 0, 0, 0, 0, 1, 1, 1],
        focal_length_x=FX, focal_length_y=FY,
    )
    ys0, xs0 = np.where(mask > 0)
    ys, xs = np.where(tmask > 0)
    width = xs0.max() - xs0.min()
    shift = xs0.mean() - xs.mean()  # flip makes +dx move left in pixels
    assert abs(abs(shift) - width / 2) < width * 0.25, (shift, width)


def test_scale_grows_object(scene):
    img, mask, depth = scene
    _, tmask, _ = PS.re_edit_3d_depth(
        img, mask, depth, [0, 0, 0, 0, 0, 0, 1.5, 1.5, 1.0],
        focal_length_x=FX, focal_length_y=FY,
    )
    assert (tmask > 0).sum() > 1.5 * (mask > 0).sum()


def test_occlusion_front_wins():
    """Two coincident points: the nearer one should dominate the pixel."""
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 8.0]])
    rgb = jnp.asarray([[255.0, 0, 0], [0, 0, 255.0]])
    wts = jnp.ones(2)
    img, mask = PS.splat_points(pts, rgb, wts, h=16, w=16, fx=16.0, fy=16.0)
    px = np.asarray(img[8, 8])
    assert px[0] > 250 and px[2] < 5, px  # red (near) wins
    assert mask[8, 8] == 1


def test_fill_holes():
    img = jnp.zeros((16, 16, 3)).at[4:12, 4:12].set(100.0)
    known = jnp.zeros((16, 16)).at[4:12, 4:12].set(1.0)
    # punch a hole
    img = img.at[7:9, 7:9].set(0.0)
    known = known.at[7:9, 7:9].set(0.0)
    filled, known2 = PS.fill_holes_partial_conv(img, known, iterations=4)
    np.testing.assert_allclose(np.asarray(filled[7:9, 7:9]), 100.0, atol=1e-3)
    assert np.asarray(known2).min() >= 0  # grows monotonically


def test_rotation_y_changes_layout(scene):
    img, mask, depth = scene
    # vary depth so a y-rotation actually changes the projection
    depth = depth + np.linspace(0, 2, W)[None, :].astype(np.float32)
    _, tmask, _ = PS.re_edit_3d_depth(
        img, mask, depth, [0, 0, 0, 0, 25, 0, 1, 1, 1],
        focal_length_x=FX, focal_length_y=FY,
    )
    assert (tmask > 0).any()
    assert not np.array_equal(tmask > 0, mask > 0)


def test_compute_correspondence_identity_and_translate(scene):
    img, mask, depth = scene
    c = PS.compute_correspondence(depth, mask, [0, 0, 0, 0, 0, 0, 1, 1, 1],
                                  FX, FY)
    rr, cc = np.mgrid[24:40, 20:36]
    np.testing.assert_allclose(c[24:40, 20:36, 0], rr, atol=0.01)
    np.testing.assert_allclose(c[24:40, 20:36, 1], cc, atol=0.01)
    assert np.isnan(c[0, 0]).all()

    # +dx (p3d flip) moves targets LEFT by ~half the object width
    c2 = PS.compute_correspondence(depth, mask, [0.5, 0, 0, 0, 0, 0, 1, 1, 1],
                                   FX, FY)
    shift = c[24:40, 20:36, 1].mean() - c2[24:40, 20:36, 1].mean()
    width = 16
    assert abs(shift - width / 2) < width * 0.2, shift


def test_inpaint_fmm_fills_hole():
    """Boundary-peel inpainting: constant surroundings fill the hole with
    the constant; nothing outside the hole changes."""
    import jax.numpy as jnp

    from freefine_tpu.ops.point_splat import inpaint_fmm

    img = np.full((16, 16, 3), 7.0, np.float32)
    img[4:10, 4:10] = 0.0
    hole = np.zeros((16, 16), np.float32)
    hole[4:10, 4:10] = 1.0
    out = np.asarray(inpaint_fmm(jnp.asarray(img), jnp.asarray(hole)))
    np.testing.assert_allclose(out, 7.0, atol=1e-5)


def test_inpaint_fmm_gradient_propagation(rng_np):
    """A hole between two differently-valued sides blends between them and
    contains no unfilled (zero) pixels."""
    import jax.numpy as jnp

    from freefine_tpu.ops.point_splat import inpaint_fmm

    img = np.zeros((12, 12, 1), np.float32)
    img[:, :4] = 1.0
    img[:, 8:] = 3.0
    hole = np.zeros((12, 12), np.float32)
    hole[:, 4:8] = 1.0
    out = np.asarray(inpaint_fmm(jnp.asarray(img), jnp.asarray(hole)))[:, :, 0]
    assert (out[:, 4:8] >= 1.0 - 1e-5).all() and (out[:, 4:8] <= 3.0 + 1e-5).all()
    # closer to the left edge -> closer to 1, right edge -> closer to 3
    assert out[6, 4] < out[6, 7]
