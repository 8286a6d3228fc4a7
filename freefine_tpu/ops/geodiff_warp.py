"""GeoBench-3D authoring warp — GeoDiffuser conventions, TPU-native.

Rebuilds the transform chain the reference uses to author the 3D
benchmark's inputs (evaluation/FreeFine/get_3d_transform_correspondence.py
:179-291 -> GeoDiffuser utils/ui_utils2.get_transformed_mask:685-743 ->
utils/vis_utils.get_transform_coordinates:404-479 ->
utils/warp_utils.forward_splatting_pytorch3d_warp:407-500):

  * depth: Depth-Anything disparity -> ``max - disp`` (depth_predictor.py
    :364-370), normalised to [0, 1] with the far plane (>0.95) snapped to
    1.0 (vis_utils.py:410-423); the reference's constant-depth mode (all
    0.5) is preserved verbatim;
  * pinhole K with focal 550 at 512^2, principal point at the image
    center (vis_utils.camera_matrix:79-88);
  * transform_in = T(tx, ty, tz) @ S @ Rx @ Ry @ Rz (column-vector 4x4,
    translations in edit_param/LENGTH units, ui_utils2.py:709-735),
    conjugated about the masked-point mean (warp_utils.py:425-437);
  * re-projection normalised by (w-1, h-1) — an align_corners grid
    (warp_utils.cam2pixel_vanilla:599-646) — then denormalised to absolute
    pixels for the correspondence .npy
    (get_3d_transform_correspondence.py:55-69);
  * rendering: the FULL image moves (the pose applies to every back-
    projected pixel); we forward-splat it with a softmax-z bilinear
    scatter, carrying the object mask as a fourth channel whose weighted
    mean is thresholded at 0.5 — the same occlusion semantics as the
    reference's z-composited point rasteriser without a K-buffer sort;
  * mesh footprint: the reference rasterises a triangle mesh over the
    masked pixels (warp_utils.get_mesh:360-470 + splatter_mesh); we cover
    the same footprint by bilinear supersampling of each masked quad's
    target coordinates (k x k lattice points per quad) scattered into the
    pixel grid — a fixed-shape scatter-only rasteriser.  Documented
    deviation: a quad contributes only when all 4 corners are masked,
    where the reference also accepts 3-corner triangles; the footprints
    differ by <1 px along the mask boundary.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_depth(depth: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(depth01, valid01) per vis_utils.get_transform_coordinates:404-423.

    Constant-depth inputs (sum == 0.5 * H * W) pass through as all-0.5
    with everything valid — the reference's "constant_depth" mode."""
    d = np.asarray(depth, np.float32)
    h, w = d.shape
    if float(d.sum()) == 0.5 * h * w:
        d = np.full_like(d, 0.5)
    else:
        d = d / (d.max() + 1e-8)
        d[d > 0.95] = 1.0
    valid = (d < 0.95).astype(np.float32)
    return d, valid


def geodiff_transform_matrix(
    edit_param: Sequence[float], length: int = 512
) -> np.ndarray:
    """4x4 transform_in = T(t/length) @ S @ Rx @ Ry @ Rz
    (ui_utils2.get_transformed_mask:709-735; vis_utils.rotateAxis:26-66,
    translateMatrix:68-75).  edit_param is the GeoBench 9-tuple
    (tx, ty, tz, rx, ry, rz, sx, sy, sz) with translations in pixels."""
    tx, ty, tz, rx, ry, rz, sx, sy, sz = [float(v) for v in edit_param]

    def rot(deg, axis):
        r = np.radians(deg)
        c, s = np.cos(r), np.sin(r)
        m = np.eye(4)
        if axis == 0:
            m[1:3, 1:3] = [[c, -s], [s, c]]
        elif axis == 1:
            m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
        else:
            m[0:2, 0:2] = [[c, -s], [s, c]]
        return m

    t = np.eye(4)
    t[:3, 3] = [tx / length, ty / length, tz / length]
    s = np.diag([sx, sy, sz, 1.0])
    return (t @ s @ rot(rx, 0) @ rot(ry, 1) @ rot(rz, 2)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("supersample",))
def geodiff_warp(
    img: jnp.ndarray,          # [H, W, 3] float 0..255
    mask01: jnp.ndarray,       # [H, W] float {0, 1} object mask
    depth01: jnp.ndarray,      # [H, W] normalised depth (normalize_depth)
    valid01: jnp.ndarray,      # [H, W] float {0, 1} near-plane validity
    background: jnp.ndarray,   # [H, W, 3] float 0..255 inpainted bg
    matrix: jnp.ndarray,       # [4, 4] transform_in
    focal: jnp.ndarray,        # scalar focal length (550 @ 512^2)
    *,
    supersample: int = 4,
    tau: float = 0.02,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (coarse [H,W,3], full_mask [H,W], mesh_mask [H,W],
    coords_abs [H,W,2] (x, y)).

    One fused XLA program: back-project -> center-conjugated transform ->
    re-project -> softmax-z splat (image + mask) -> quad-supersampled mesh
    footprint -> background composite."""
    h, w = mask01.shape
    f = jnp.float32(focal)
    cx, cy = w / 2.0, h / 2.0

    obj = mask01 * valid01  # the mask every reference stage uses

    # back-projection (warp_utils.pixel2cam:738-747)
    row, col = jnp.mgrid[0:h, 0:w]
    z = depth01.astype(jnp.float32)
    px = (col - cx) / f * z
    py = (row - cy) / f * z
    p = jnp.stack([px, py, z], -1).reshape(-1, 3)  # [N, 3]

    # conjugate the transform about the masked mean (warp_utils.py:425-437)
    wts = obj.reshape(-1)
    center = (p * wts[:, None]).sum(0) / jnp.maximum(wts.sum(), 1.0)
    rot3 = matrix[:3, :3]
    tr3 = matrix[:3, 3]
    # pose = T(c) @ M @ T(-c): p' = R (p - c) + t + c
    pt = (p - center) @ rot3.T + tr3 + center

    # re-projection (warp_utils.cam2pixel_vanilla:599-646).  K is applied
    # BEFORE the z-clamp, so the principal-point term rides the un-clamped
    # z: u = (f x + cx z) / max(z, 1e-3) — identical to x f / z + cx for
    # valid depths, but reference-exact for points clamped behind the
    # camera (golden-pinned in test_reference_golden_warp.py)
    zt = jnp.maximum(pt[:, 2], 1e-3)
    u = (pt[:, 0] * f + cx * pt[:, 2]) / zt
    v = (pt[:, 1] * f + cy * pt[:, 2]) / zt
    coords_abs = jnp.stack([u, v], -1).reshape(h, w, 2)

    # softmax-z bilinear splat of [rgb, mask] over the full image
    occ_z = jnp.exp(
        -(zt - zt.min()) / (tau * jnp.maximum(zt.max() - zt.min(), 1e-6))
    )
    vals = jnp.concatenate(
        [img.reshape(-1, 3).astype(jnp.float32), obj.reshape(-1, 1)], -1
    )
    u0, v0 = jnp.floor(u), jnp.floor(v)
    fu, fv = u - u0, v - v0
    acc = jnp.zeros((h * w, 4), jnp.float32)
    wacc = jnp.zeros((h * w,), jnp.float32)
    for du, dv, kw in (
        (0, 0, (1 - fu) * (1 - fv)),
        (1, 0, fu * (1 - fv)),
        (0, 1, (1 - fu) * fv),
        (1, 1, fu * fv),
    ):
        uu, vv = u0 + du, v0 + dv
        inside = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        idx = (
            jnp.clip(vv, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(uu, 0, w - 1).astype(jnp.int32)
        )
        wgt = kw * occ_z * inside
        acc = acc.at[idx].add(wgt[:, None] * vals)
        wacc = wacc.at[idx].add(wgt)
    # weighted mean where any point lands; the exp(-z) weights can be
    # uniformly tiny far from the global z-min, so normalise by the true
    # sum (the scale cancels) instead of flooring it with a constant
    splat = jnp.where(
        wacc[:, None] > 0, acc / jnp.where(wacc > 0, wacc, 1.0)[:, None], 0.0
    )
    warped_img = splat[:, :3].reshape(h, w, 3)
    full_mask = (splat[:, 3] > 0.5).astype(jnp.float32).reshape(h, w)

    # mesh footprint by quad supersampling (replaces rasterize_meshes)
    k = supersample
    c00 = coords_abs[:-1, :-1]
    c01 = coords_abs[:-1, 1:]
    c10 = coords_abs[1:, :-1]
    c11 = coords_abs[1:, 1:]
    quad_ok = (
        obj[:-1, :-1] * obj[:-1, 1:] * obj[1:, :-1] * obj[1:, 1:]
    ) > 0.5  # all 4 corners masked
    ta = jnp.linspace(0.0, 1.0, k)  # includes the corners
    a = ta[None, :].repeat(k, 0).reshape(-1)   # x-fraction
    b = ta[:, None].repeat(k, 1).reshape(-1)   # y-fraction
    # [Q, k*k, 2] bilinear lattice over each quad
    pts = (
        ((1 - a) * (1 - b))[None, :, None] * c00.reshape(-1, 1, 2)
        + (a * (1 - b))[None, :, None] * c01.reshape(-1, 1, 2)
        + ((1 - a) * b)[None, :, None] * c10.reshape(-1, 1, 2)
        + (a * b)[None, :, None] * c11.reshape(-1, 1, 2)
    )
    mu = jnp.round(pts[..., 0]).astype(jnp.int32)
    mv = jnp.round(pts[..., 1]).astype(jnp.int32)
    m_inside = (mu >= 0) & (mu < w) & (mv >= 0) & (mv < h)
    midx = jnp.clip(mv, 0, h - 1) * w + jnp.clip(mu, 0, w - 1)
    cover = (m_inside & quad_ok.reshape(-1, 1)).astype(jnp.float32)
    mesh_acc = jnp.zeros((h * w,), jnp.float32).at[
        midx.reshape(-1)
    ].add(cover.reshape(-1))
    mesh_mask = (mesh_acc > 0).astype(jnp.float32).reshape(h, w)

    # composite over the background (ui_utils2.project_image_latest:580)
    coarse = jnp.where(
        full_mask[:, :, None] > 0, warped_img, background.astype(jnp.float32)
    )
    return coarse, full_mask, mesh_mask, coords_abs


def author_case(
    ori_img: np.ndarray,       # [H, W, 3] uint8
    ori_mask: np.ndarray,      # [H, W] uint8 0/255
    depth: np.ndarray,         # [H, W] raw depth (max-disp or constant 0.5)
    background: np.ndarray,    # [H, W, 3] uint8
    edit_param: Sequence[float],
    focal_length: float = 550.0,
    supersample: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One GeoBench-3D case -> (coarse uint8, full_mask u8*255,
    mesh_mask u8*255, md_mask u8*255, coords_abs [H,W,2] float32 (x, y)).

    md_mask = np.where(mesh_mask, 0, full_mask)
    (get_3d_transform_correspondence.py:252) — the splat coverage the mesh
    does NOT explain: the benchmark's auto draw mask."""
    h, w = np.asarray(ori_mask).shape[:2]
    assert len(list(edit_param)) == 9, "3D edit_param must be 9 values"
    d01, valid = normalize_depth(depth)
    m01 = (np.asarray(ori_mask) > 0).astype(np.float32)
    mat = geodiff_transform_matrix(edit_param, length=w)
    coarse, full, mesh, coords = geodiff_warp(
        jnp.asarray(ori_img, jnp.float32),
        jnp.asarray(m01),
        jnp.asarray(d01),
        jnp.asarray(valid),
        jnp.asarray(background, jnp.float32),
        jnp.asarray(mat),
        jnp.float32(focal_length),
        supersample=supersample,
    )
    coarse = np.clip(np.round(np.asarray(coarse)), 0, 255).astype(np.uint8)
    full = (np.asarray(full) > 0).astype(np.uint8) * 255
    mesh = (np.asarray(mesh) > 0).astype(np.uint8) * 255
    md = np.where(mesh > 0, 0, full).astype(np.uint8)
    return coarse, full, mesh, md, np.asarray(coords, np.float32)
