"""Depth-based 3D editing: back-projection, rigid transform, point splatting.

TPU-native replacement for the reference's PyTorch3D point-cloud pipeline
(/root/reference/src/utils/geo_utils.py:342-691):

  * back-projection with pinhole intrinsics (geo_utils.py:433-440);
  * the exact transform semantics of `transform_point_cloud`
    (:407-426): relative->absolute translation scaled by the cloud extent,
    then p' = ((p + t) @ R_euler_xyz) * s applied about the object center in
    flipped (PyTorch3D-style) coordinates;
  * rendering: instead of the CUDA `PointsRasterizer` + `AlphaCompositor`
    (z-buffered radius splats, geo_utils.py:480-517) we use a deterministic
    softmax-z forward splat — every point scatters bilinearly into its 4
    neighbouring pixels with an exp(-z/tau) occlusion weight (the softsplat
    formulation) via `scatter-add`, which XLA compiles to efficient TPU
    sorts/segments with no native code;
  * hole filling by iterative partial-convolution interpolation
    (reference `PartialConvInterpolation`, geo_utils.py:235-290).

Deliberate deviation (documented): the reference re-projects through a
FoV-60 PyTorch3D camera regardless of the back-projection focal length
(geo_utils.py:480), slightly rescaling the object; we re-project through
the same pinhole intrinsics used for back-projection, so an identity
transform reproduces the input pixels exactly.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def euler_xyz_matrix(rx: jnp.ndarray, ry: jnp.ndarray, rz: jnp.ndarray) -> jnp.ndarray:
    """R = Rx @ Ry @ Rz (PyTorch3D euler_angles_to_matrix, convention XYZ);
    angles in radians.  Applied as p @ R (PyTorch3D Rotate convention)."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    rx_m = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry_m = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz_m = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx_m @ ry_m @ rz_m


def backproject(
    depth: jnp.ndarray, fx: float, fy: float
) -> jnp.ndarray:
    """[H, W] depth -> [H*W, 3] camera-space points (opencv convention,
    geo_utils.py:433-440: x=(i-w/2)z/fx, y=(j-h/2)z/fy)."""
    h, w = depth.shape
    j, i = jnp.mgrid[0:h, 0:w]
    z = depth.astype(jnp.float32)
    x = (i - w / 2.0) * z / fx
    y = (j - h / 2.0) * z / fy
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


def transform_object_points(
    points: jnp.ndarray,            # [N, 3] camera-space points
    weights: jnp.ndarray,           # [N] 1 = object point
    transforms: Sequence[float],    # (dx, dy, dz, rx, ry, rz, sx, sy, sz)
) -> jnp.ndarray:
    """The reference's flip -> center -> translate/rotate/scale -> un-center
    -> un-flip chain (geo_utils.py:448-463 + transform_point_cloud :417-426).

    Masked statistics use `weights` so the op stays fixed-shape/jittable
    (the reference gathers object points dynamically).
    """
    dx, dy, dz, rx, ry, rz, sx, sy, sz = [jnp.float32(t) for t in transforms]
    p = points.astype(jnp.float32)
    wsum = jnp.maximum(weights.sum(), 1.0)

    # opencv -> pytorch3d: negate x, y (geo_utils.py:452)
    p = p * jnp.array([-1.0, -1.0, 1.0])

    # center at the (masked) mean (geo_utils.py:457-458)
    center = (p * weights[:, None]).sum(0) / wsum
    p = p - center

    # relative -> absolute translation: dx scaled by masked axis extent
    # (refine_transforms + cal_shifting_coords, geo_utils.py:403-414)
    big = jnp.float32(1e30)
    pm = jnp.where(weights[:, None] > 0, p, big)
    px = jnp.where(weights[:, None] > 0, p, -big)
    extent = px.max(0) - pm.min(0)
    t = extent * jnp.stack([dx, dy, dz])

    r = euler_xyz_matrix(
        jnp.deg2rad(rx), jnp.deg2rad(ry), jnp.deg2rad(rz)
    )
    s = jnp.stack([sx, sy, sz])
    # Transform3d: translation.compose(rotation).compose(scale) applies
    # translate FIRST, then rotate, then scale (geo_utils.py:373-375)
    p = ((p + t) @ r) * s

    # un-center, un-flip
    p = p + center
    return p * jnp.array([-1.0, -1.0, 1.0])


@functools.partial(jax.jit, static_argnames=("h", "w", "fx", "fy"))
def splat_points(
    points: jnp.ndarray,      # [N, 3] camera-space (opencv) points
    rgb: jnp.ndarray,         # [N, 3] float colors
    weights: jnp.ndarray,     # [N] per-point validity in [0, 1]
    *,
    h: int,
    w: int,
    fx: float,
    fy: float,
    tau: float = 0.02,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax-z bilinear forward splat -> ([h, w, 3] image, [h, w] mask).

    Occlusion:每 point weight = exp(-(z - z_min) / (tau * z_range)), the
    softsplat importance-weighting — nearer points dominate overlapping
    pixels without a sort (replaces the K-buffer AlphaCompositor).
    """
    p = points.astype(jnp.float32)
    z = jnp.maximum(p[:, 2], 1e-6)
    u = p[:, 0] * fx / z + w / 2.0
    v = p[:, 1] * fy / z + h / 2.0

    zmin = jnp.min(jnp.where(weights > 0, z, jnp.inf))
    zmax = jnp.max(jnp.where(weights > 0, z, -jnp.inf))
    zrange = jnp.maximum(zmax - zmin, 1e-6)
    occ = jnp.exp(-(z - zmin) / (tau * zrange)) * weights

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0

    img_acc = jnp.zeros((h * w, 3), jnp.float32)
    w_acc = jnp.zeros((h * w,), jnp.float32)
    cov_acc = jnp.zeros((h * w,), jnp.float32)

    for du, dv, kw in (
        (0, 0, (1 - fu) * (1 - fv)),
        (1, 0, fu * (1 - fv)),
        (0, 1, (1 - fu) * fv),
        (1, 1, fu * fv),
    ):
        uu = u0 + du
        vv = v0 + dv
        inside = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        idx = (
            jnp.clip(vv, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(uu, 0, w - 1).astype(jnp.int32)
        )
        wgt = kw * occ * inside
        img_acc = img_acc.at[idx].add(wgt[:, None] * rgb.astype(jnp.float32))
        w_acc = w_acc.at[idx].add(wgt)
        cov_acc = cov_acc.at[idx].add(kw * weights * inside)

    img = img_acc / jnp.maximum(w_acc[:, None], 1e-8)
    mask = (cov_acc > 0.05).astype(jnp.float32)
    return (img * mask[:, None]).reshape(h, w, 3), mask.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("iterations", "kernel"))
def fill_holes_partial_conv(
    img: jnp.ndarray, known: jnp.ndarray, iterations: int = 8, kernel: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterative partial-convolution hole filling (reference
    `PartialConvInterpolation`, geo_utils.py:235-290): each round, unknown
    pixels take the mean of known neighbours; the known set grows.

    img [H, W, C], known [H, W] in {0,1}.  Returns (filled, known')."""
    pad = kernel // 2

    def body(_, carry):
        x, m = carry
        msum = jax.lax.reduce_window(
            m, 0.0, jax.lax.add, (kernel, kernel), (1, 1),
            [(pad, pad), (pad, pad)],
        )
        xsum = jax.lax.reduce_window(
            x * m[:, :, None], 0.0, jax.lax.add,
            (kernel, kernel, 1), (1, 1, 1),
            [(pad, pad), (pad, pad), (0, 0)],
        )
        fill = xsum / jnp.maximum(msum[:, :, None], 1e-8)
        grow = (msum > 0).astype(jnp.float32)
        x = x * m[:, :, None] + fill * (1 - m[:, :, None]) * grow[:, :, None]
        return x, jnp.maximum(m, grow)

    x, m = jax.lax.fori_loop(
        0, iterations, body, (img.astype(jnp.float32), known.astype(jnp.float32))
    )
    return x, m


@jax.jit
def inpaint_fmm(img: jnp.ndarray, hole: jnp.ndarray) -> jnp.ndarray:
    """Fast-marching tensor inpainting (reference tensor_inpaint_fmm,
    geo_utils.py:171-232) as a jittable boundary-peel while_loop.

    The reference's priority queue only ever holds distance 1.0 (4-neighbour
    offsets), so its FMM degenerates to BFS onion layers; here each layer
    fills in parallel with the mean of its KNOWN 4-neighbours.  Documented
    deviation: same-layer pixels don't observe each other's just-filled
    values (the reference's pop order does) — the parallel version is
    order-free and deterministic.

    img [H, W, C]; hole [H, W] in {0,1} (1 = pixel to repair).
    """
    h, w = hole.shape

    def nsum(x):
        """Sum of the 4 edge-clipped neighbours ([H, W] or [H, W, C])."""
        pad = [(1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 2)
        p = jnp.pad(x, pad)
        return (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:])

    def cond(carry):
        _, m, it = carry
        return jnp.logical_and(m.sum() > 0, it < h + w)

    def body(carry):
        x, m, it = carry
        known = 1.0 - m
        cnt = nsum(known)
        vals = nsum(x * known[:, :, None])
        fill = vals / jnp.maximum(cnt[:, :, None], 1e-8)
        newly = (m > 0) & (cnt > 0)
        x = jnp.where(newly[:, :, None], fill, x)
        m = jnp.where(newly, 0.0, m)
        return x, m, it + 1

    x, _, _ = jax.lax.while_loop(
        cond, body,
        (img.astype(jnp.float32), hole.astype(jnp.float32), jnp.int32(0)),
    )
    return x


def re_edit_3d_depth(
    src_img: np.ndarray,
    src_mask: np.ndarray,
    depth: np.ndarray,
    edit_param: Sequence[float],
    inp_cur: Optional[np.ndarray] = None,
    focal_length_x: float = 470.4,
    focal_length_y: float = 470.4,
    fill_iters: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Depth-based coarse 3D edit (reference `re_edit_3d` over the
    IntegratedP3DTransRasterBlending render, vis_utils.py:275-339 +
    geo_utils.py:427-528).

    edit_param: 9-tuple (dx, dy, dz, rx, ry, rz, sx, sy, sz) — relative
    translations, degrees, scales.  Returns (final_image, target_mask_255,
    rendered_object).
    """
    src_img = np.asarray(src_img)
    src_mask = np.asarray(src_mask)
    if src_mask.ndim == 3:
        src_mask = src_mask[:, :, 0]
    if inp_cur is None:
        inp_cur = src_img
    h, w = src_mask.shape

    depth_j = jnp.asarray(depth, jnp.float32)
    pts = backproject(depth_j, focal_length_x, focal_length_y)
    weights = jnp.asarray((src_mask > 0).reshape(-1), jnp.float32)
    rgb = jnp.asarray(src_img.reshape(-1, 3), jnp.float32)

    p9 = list(map(float, edit_param))
    assert len(p9) == 9, "3D edit_param must be 9 values"
    pts_t = transform_object_points(pts, weights, p9)
    img_r, mask_r = splat_points(
        pts_t, rgb, weights, h=h, w=w, fx=focal_length_x, fy=focal_length_y
    )
    filled, known = fill_holes_partial_conv(img_r, mask_r, iterations=fill_iters)

    # the final mask: close small gaps then keep the filled interior
    from freefine_tpu.masks import dilate, erode

    mask_closed = erode(dilate(mask_r, 5), 5)
    keep = jnp.maximum(mask_r, mask_closed * known)

    rendered = np.clip(np.nan_to_num(np.asarray(filled)), 0, 255).astype(np.uint8)
    tmask = (np.asarray(keep) > 0)[:, :, None]
    final = np.where(tmask, rendered, np.asarray(inp_cur))
    return final, tmask[:, :, 0].astype(np.uint8) * 255, rendered


def compute_correspondence(
    depth: np.ndarray,
    mask: np.ndarray,
    edit_param: Sequence[float],
    focal_length_x: float = 470.4,
    focal_length_y: float = 470.4,
) -> np.ndarray:
    """Dense source->target pixel correspondence for a 3D edit.

    The MD metric's 3D ground truth (reference
    evaluation/FreeFine/get_3d_transform_correspondence.py:179-291 builds
    these maps via GeoDiffuser mesh-warping + CUDA softsplat and saves
    `correspondence/*.npy`; evaluation/metrics/MD/mean_distance.py:102-108
    consumes them).  Here the same map falls directly out of the
    back-project -> transform -> re-project chain: for every source pixel,
    the (row, col) it lands on after the 3D edit.

    Returns [H, W, 2] float64 (row, col), NaN outside the mask.
    """
    h, w = np.asarray(depth).shape
    pts = backproject(jnp.asarray(depth, jnp.float32), focal_length_x,
                      focal_length_y)
    m = np.asarray(mask)
    if m.ndim == 3:
        m = m[:, :, 0]
    weights = jnp.asarray((m > 0).reshape(-1), jnp.float32)
    p9 = list(map(float, edit_param))
    assert len(p9) == 9
    pts_t = np.asarray(transform_object_points(pts, weights, p9))
    z = np.maximum(pts_t[:, 2], 1e-6)
    u = pts_t[:, 0] * focal_length_x / z + w / 2.0
    v = pts_t[:, 1] * focal_length_y / z + h / 2.0
    corr = np.stack([v, u], axis=-1).reshape(h, w, 2)
    corr[m <= 0] = np.nan
    return corr
