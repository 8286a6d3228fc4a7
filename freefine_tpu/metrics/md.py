"""MD — mean distance metric (reference evaluation/metrics/MD/).

SIFT keypoints inside the source mask (host cv2, offline) -> DIFT semantic
correspondence in the edited image (on-TPU, freefine_tpu.ops.dift) ->
distance to the ground-truth transformed coordinates:

  * 2D translate: analytic pixel offsets (mean_distance.py:82-89)
  * 2D rotate/scale: cv2.getRotationMatrix2D about the mask's center of
    mass (:90-101)
  * 3D: precomputed dense correspondence .npy (:102-108, axes flipped)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def sift_keypoints_in_mask(
    src_img: np.ndarray, tgt_img: np.ndarray, src_mask01: np.ndarray,
    max_points: int = 30,
) -> np.ndarray:
    """Matched SIFT keypoints of the source restricted to the mask,
    sorted by match distance (reference get_Matches, mean_distance.py).
    Returns [N, 2] (row, col) int coordinates."""
    import cv2

    gray_s = cv2.cvtColor(src_img, cv2.COLOR_RGB2GRAY)
    gray_t = cv2.cvtColor(tgt_img, cv2.COLOR_RGB2GRAY)
    sift = cv2.SIFT_create()
    kp1, des1 = sift.detectAndCompute(gray_s, None)
    kp2, des2 = sift.detectAndCompute(gray_t, None)
    if des1 is None or des2 is None:
        raise ValueError("no SIFT features found")
    bf = cv2.BFMatcher()
    matches = bf.match(des1, des2)
    matches = sorted(matches, key=lambda m: m.distance)
    pts = []
    h, w = src_mask01.shape[:2]
    for m in matches:
        x, y = kp1[m.queryIdx].pt
        r, c = int(round(y)), int(round(x))
        if 0 <= r < h and 0 <= c < w and src_mask01[r, c] > 0.5:
            pts.append((r, c))
        if len(pts) >= max_points:
            break
    if not pts:
        raise ValueError("no in-mask keypoints")
    return np.asarray(pts, np.int64)


def center_of_mass(mask01: np.ndarray):
    ys, xs = np.nonzero(mask01 > 0.5)
    return (float(xs.mean()), float(ys.mean()))


def transform_coordinates(
    edit_param: Sequence[float], size, mask01: np.ndarray,
    path_3d: Optional[str] = None,
) -> np.ndarray:
    """Ground-truth (row, col) of every source pixel after the edit
    (reference get_transform_coordinates, mean_distance.py:81-108)."""
    p = list(map(float, edit_param))
    h, w = size
    if p[0] != 0 or p[1] != 0:
        rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return np.stack([rr + p[1], cc + p[0]], axis=-1).astype(np.float64)
    if p[5] != 0 or p[6] != 1:
        cx, cy = center_of_mass(mask01)
        if p[5] != 0:
            theta = np.deg2rad(p[5])
            a, b = np.cos(theta), np.sin(theta)
            matrix = np.array(
                [[a, b, (1 - a) * cx - b * cy],
                 [-b, a, b * cx + (1 - a) * cy]]
            )
        else:
            s = p[6]
            matrix = np.array(
                [[s, 0, (1 - s) * cx], [0, s, (1 - s) * cy]]
            )
        x, y = np.meshgrid(np.arange(w), np.arange(h))  # note reference swap
        x, y = y, x  # reference builds (x=row, y=col) grids
        ones = np.ones_like(x)
        pts = np.stack((x, y, ones), axis=-1).reshape(-1, 3)
        return pts.dot(matrix.T).reshape(h, w, 2)
    assert path_3d is not None, "3D case needs a correspondence .npy"
    return np.load(path_3d)[..., ::-1].copy()


def mean_distance_single(
    matched_rc: np.ndarray,      # [N, 2] DIFT-matched (row, col) in the edit
    keypoints_rc: np.ndarray,    # [N, 2] source keypoints
    gt_coords: np.ndarray,       # [H, W, 2] ground-truth (row, col)
) -> np.ndarray:
    """Per-point distances ||gt[k] - matched[k]|| (mean_distance.py:161-166)."""
    tp = gt_coords[keypoints_rc[:, 0], keypoints_rc[:, 1]]
    return np.linalg.norm(tp - matched_rc.astype(np.float64), axis=-1)
