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
    """SIFT keypoints of the source restricted to the mask, filtered by a
    Lowe 0.75 ratio test against the target, with an ORB fallback when no
    SIFT match survives (reference get_Matches / detect_interest_points,
    mean_distance.py:28-79).  Returns [N, 2] (row, col) int coordinates."""
    import cv2

    sift = cv2.SIFT_create()
    kp1, des1 = sift.detectAndCompute(src_img, None)
    kp2, des2 = sift.detectAndCompute(tgt_img, None)
    h, w = src_mask01.shape[:2]
    pts = []
    if des1 is not None and des2 is not None and len(des2) >= 2:
        bf = cv2.BFMatcher()
        try:
            matches = bf.knnMatch(des1, des2, k=2)
        except cv2.error:
            matches = []
        for pair in matches:
            if len(pair) < 2:
                continue
            m, n = pair
            if m.distance < 0.75 * n.distance:
                x, y = kp1[m.queryIdx].pt
                r, c = int(y), int(x)
                if 0 <= r < h and 0 <= c < w and src_mask01[r, c] > 0.5:
                    pts.append((r, c))
    if not pts:
        # ORB interest-point fallback (mean_distance.py:28-46,74-75)
        orb = cv2.ORB_create()
        for k in orb.detect(src_img, None):
            r, c = int(k.pt[1]), int(k.pt[0])
            if 0 <= r < h and 0 <= c < w and src_mask01[r, c] >= 0.5:
                pts.append((r, c))
    if not pts:
        raise ValueError("no in-mask keypoints")
    return np.asarray(pts, np.int64)[:max_points]


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


def default_corr_path(gen_path: str) -> str:
    """3D ground-truth correspondence .npy derived from the generated-image
    path the way the reference does (mean_distance.py:132-133): the
    4th-from-last path component (the method name) is replaced with
    'correspondence' and the extension with .npy."""
    import os.path as osp

    parts = gen_path.split("/")
    if len(parts) >= 4:
        parts[-4] = "correspondence"
    root, _ = osp.splitext("/".join(parts))
    return root + ".npy"


def _is_2d_param(p) -> bool:
    """edit_param handled analytically: translate, z-rotate, or uniform
    scale (mean_distance.py:81-101); anything else needs the 3D .npy."""
    p = list(map(float, p))
    return (p[0] != 0 or p[1] != 0) or (p[5] != 0 or p[6] != 1)


def compute_md(
    data: dict,
    image_label: str,
    featurize,
    max_points: int = 30,
    corr_path_for=default_corr_path,
    verbose: bool = True,
) -> float:
    """Full MD metric over a GeoBench result dict (reference calculate_md,
    mean_distance.py:111-169).

    `featurize(img_uint8_hwc, prompt) -> np.ndarray [H, W, C]` supplies the
    DIFT semantic features at image resolution (see
    `freefine_tpu.ops.dift.make_sd_featurizer`); injecting it keeps the
    metric testable without SD weights.

    Per case: load source/edit images (edit bilinearly resized to source
    size), SIFT keypoints inside the source mask, cosine-argmax DIFT match
    in the edit, distance to the analytic (2D) or precomputed-.npy (3D)
    ground-truth coordinates; cases whose keypoint detection fails are
    skipped, like the reference (:137-141).
    """
    from PIL import Image

    from freefine_tpu.ops.dift import match_points

    pairs = []
    for da in data.values():
        for ins in da["instances"].values():
            for gt in ins.values():
                pairs.append((
                    gt["ori_img_path"], gt[image_label], gt["ori_mask_path"],
                    gt["edit_param"], gt.get("obj_label", ""),
                    gt.get("correspondence_path"),
                ))

    all_dist = []
    for s_path, t_path, m_path, edit_param, prompt, corr in pairs:
        s_img = np.array(Image.open(s_path).convert("RGB"))
        size = (s_img.shape[1], s_img.shape[0])  # PIL (w, h)
        t_img = np.array(Image.open(t_path).convert("RGB").resize(size, Image.BILINEAR))
        s_mask = np.array(Image.open(m_path).convert("L").resize(size, Image.BILINEAR))
        s_mask = s_mask / 255.0 if s_mask.max() > 1 else s_mask.astype(np.float64)

        try:
            kps = sift_keypoints_in_mask(s_img, t_img, s_mask, max_points)
        except ValueError:
            if verbose:
                print(f"MD: no keypoints, skipping {s_path}")
            continue

        path_3d = None
        if not _is_2d_param(edit_param):
            path_3d = corr or corr_path_for(t_path)
        gt_coords = transform_coordinates(
            edit_param, s_img.shape[:2], s_mask, path_3d
        )

        ft_s = featurize(s_img, prompt)
        ft_t = featurize(t_img, prompt)
        matched = np.asarray(match_points(ft_s, ft_t, kps))
        all_dist.extend(mean_distance_single(matched, kps, gt_coords).tolist())

    if not all_dist:
        raise ValueError("MD: no measurable cases (keypoint detection failed everywhere)")
    md = float(np.mean(all_dist))
    if verbose:
        print(f"MD: {md}")
    return md


def mean_distance_single(
    matched_rc: np.ndarray,      # [N, 2] DIFT-matched (row, col) in the edit
    keypoints_rc: np.ndarray,    # [N, 2] source keypoints
    gt_coords: np.ndarray,       # [H, W, 2] ground-truth (row, col)
) -> np.ndarray:
    """Per-point distances ||gt[k] - matched[k]|| (mean_distance.py:161-166)."""
    tp = gt_coords[keypoints_rc[:, 0], keypoints_rc[:, 1]]
    return np.linalg.norm(tp - matched_rc.astype(np.float64), axis=-1)
