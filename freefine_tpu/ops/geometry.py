"""Coarse geometric-edit ops: 2D affine object transforms on TPU.

Reimplements the reference's coarse 2D editing
(`re_edit_2d`, /root/reference/src/utils/vis_utils.py:210-274 and the
9-parameter variant in evaluation/FreeFine/freefine_batch_infer_2d.py:26-87)
with XLA gather-based warping instead of cv2.warpAffine:

  * the affine matrix construction reproduces cv2.getRotationMatrix2D about
    the mask-bbox center, the post-hoc anisotropic diagonal scaling and the
    (1-s)*center translation compensation — including the reference quirk
    that only the matrix diagonal (not the rotation cross terms) is scaled;
  * warping matches cv2's semantics: destination pixels sample the source
    through the inverted matrix, bilinear for images / nearest for masks,
    zero padding outside.

Host does the tiny O(1) matrix math; the [H, W] resampling is jitted.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mask_bbox_center(mask: np.ndarray) -> Tuple[float, float]:
    """(cx, cy) of the mask bounding box (vis_utils.py:220-226)."""
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    ys, xs = np.where(np.asarray(mask) > 0)
    if len(ys) == 0:
        h, w = mask.shape[:2]
        return (w - 1) / 2.0, (h - 1) / 2.0
    return (xs.max() + xs.min()) / 2.0, (ys.max() + ys.min()) / 2.0


def edit_affine_matrix(
    center: Tuple[float, float],
    dx: float,
    dy: float,
    rotation: float,
    scale_x: float,
    scale_y: float,
) -> np.ndarray:
    """2x3 forward affine matrix, exactly as the reference builds it
    (vis_utils.py:241-250): cv2.getRotationMatrix2D(center, -rotation, 1),
    translation += (dx + (1-sx)*cx, dy + (1-sy)*cy), then diagonal *= (sx, sy).
    """
    cx, cy = center
    theta = np.deg2rad(-rotation)  # cv2 angle is CCW; reference negates
    a, b = np.cos(theta), np.sin(theta)
    m = np.array(
        [[a, b, (1 - a) * cx - b * cy],
         [-b, a, b * cx + (1 - a) * cy]],
        np.float64,
    )
    m[0, 2] += dx + (1 - scale_x) * cx
    m[1, 2] += dy + (1 - scale_y) * cy
    m[0, 0] *= scale_x
    m[1, 1] *= scale_y
    return m


def invert_affine(m: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine (for dst->src sampling, cv2.warpAffine default)."""
    full = np.vstack([m, [0.0, 0.0, 1.0]])
    return np.linalg.inv(full)[:2]


@functools.partial(jax.jit, static_argnames=("method",))
def warp_affine(
    img: jnp.ndarray, inv_matrix: jnp.ndarray, method: str = "linear"
) -> jnp.ndarray:
    """cv2.warpAffine-equivalent resampling with a dst->src matrix.

    img: [H, W] or [H, W, C]; inv_matrix: [2, 3] float.
    method: 'linear' (bilinear) or 'nearest'.  Outside -> 0.
    """
    from jax.scipy.ndimage import map_coordinates

    h, w = img.shape[:2]
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    sx = inv_matrix[0, 0] * xs + inv_matrix[0, 1] * ys + inv_matrix[0, 2]
    sy = inv_matrix[1, 0] * xs + inv_matrix[1, 1] * ys + inv_matrix[1, 2]
    order = 1 if method == "linear" else 0
    x = img.astype(jnp.float32)

    def sample(chan):
        return map_coordinates(chan, [sy, sx], order=order, mode="constant", cval=0.0)

    if x.ndim == 2:
        return sample(x)
    return jnp.stack([sample(x[:, :, c]) for c in range(x.shape[2])], axis=-1)


def re_edit_2d(
    src_img: np.ndarray,
    src_mask: np.ndarray,
    edit_param: Optional[Sequence[float]] = None,
    inp_cur: Optional[np.ndarray] = None,
    *,
    dx: float = 0.0,
    dy: float = 0.0,
    rotation: float = 0.0,
    scale_x: float = 1.0,
    scale_y: float = 1.0,
):
    """Coarse 2D edit: cut the object, affine-transform it, paste over the
    inpainted background (vis_utils.py:210-274).

    edit_param accepts the 5-param [dx, dy, rz, sx, sy] or the GeoBench
    9-param [dx, dy, dz, rx, ry, rz, sx, sy, sz] layout
    (freefine_batch_infer_2d.py:26-87); keyword args are used otherwise.

    Returns (final_image, target_mask_u8_255, trans_hole_image):
      final_image     — object composited over `inp_cur` (the inpainted
                        background; defaults to the source image)
      target_mask     — transformed mask * 255
      trans_hole_image— object over the source with its original region
                        zeroed (the "hole" visualisation).
    """
    if edit_param is not None:
        p = list(map(float, edit_param))
        if len(p) == 5:
            dx, dy, rotation, scale_x, scale_y = p
        elif len(p) == 9:
            dx, dy, _, _, _, rotation, scale_x, scale_y, _ = p
        else:
            raise ValueError(f"edit_param must have 5 or 9 entries, got {len(p)}")
    src_img = np.asarray(src_img)
    src_mask = np.asarray(src_mask)
    if src_mask.ndim == 3:
        src_mask = src_mask[:, :, 0]
    if inp_cur is None:
        inp_cur = src_img

    center = mask_bbox_center(src_mask)
    m = edit_affine_matrix(center, dx, dy, rotation, scale_x, scale_y)
    inv = jnp.asarray(invert_affine(m), jnp.float32)

    timg = warp_affine(jnp.asarray(src_img), inv, method="linear")
    tmask = warp_affine(
        jnp.asarray((src_mask > 0).astype(np.uint8)), inv, method="nearest"
    )
    tmask_b = (np.asarray(tmask) > 0)[:, :, None]
    timg_u8 = np.clip(np.asarray(timg), 0, 255).astype(np.uint8)

    image_with_hole = np.where(src_mask[:, :, None] > 0, 0, src_img)
    trans_hole = np.where(tmask_b, timg_u8, image_with_hole)
    final = np.where(tmask_b, timg_u8, np.asarray(inp_cur))
    return final, (tmask_b[:, :, 0].astype(np.uint8) * 255), trans_hole


def flip_object(
    src_img: np.ndarray,
    src_mask: np.ndarray,
    horizontal: bool = True,
    inp_cur: Optional[np.ndarray] = None,
):
    """Mirror the object about its bbox center (the reference's edit
    vocabulary includes flips, generative-models/scripts/sampling/
    edit_prompt_set.py)."""
    src_img = np.asarray(src_img)
    src_mask = np.asarray(src_mask)
    if src_mask.ndim == 3:
        src_mask = src_mask[:, :, 0]
    if inp_cur is None:
        inp_cur = src_img
    cx, cy = mask_bbox_center(src_mask)
    if horizontal:
        m = np.array([[-1.0, 0.0, 2 * cx], [0.0, 1.0, 0.0]])
    else:
        m = np.array([[1.0, 0.0, 0.0], [0.0, -1.0, 2 * cy]])
    inv = jnp.asarray(invert_affine(m), jnp.float32)
    timg = np.clip(np.asarray(warp_affine(jnp.asarray(src_img), inv)), 0, 255).astype(np.uint8)
    tmask = np.asarray(
        warp_affine(jnp.asarray((src_mask > 0).astype(np.uint8)), inv, method="nearest")
    )
    tb = (tmask > 0)[:, :, None]
    final = np.where(tb, timg, np.asarray(inp_cur))
    return final, tb[:, :, 0].astype(np.uint8) * 255
