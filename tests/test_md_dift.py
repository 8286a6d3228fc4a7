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


def _textured_image(rng, h, w):
    """Noise + blob texture so SIFT/ORB find keypoints."""
    g = rng.random((h, w)) * 255
    for _ in range(3):  # cheap smoothing -> blobs
        g = (g + np.roll(g, 1, 0) + np.roll(g, 1, 1) + np.roll(g, -1, 0)
             + np.roll(g, -1, 1)) / 5
    g = (g - g.min()) / (g.max() - g.min())
    img = np.stack([g, 1 - g, g * g], -1)
    return (img * 255).astype(np.uint8)


def _patch_featurizer(img, prompt):
    """7x7 grayscale patches as descriptors — exact matching under
    translation, no SD weights needed."""
    from numpy.lib.stride_tricks import sliding_window_view

    g = img.astype(np.float32).mean(-1)
    pad = np.pad(g, 3, mode="wrap")
    win = sliding_window_view(pad, (7, 7))
    return np.ascontiguousarray(win.reshape(g.shape + (49,)))


def _write_mini_geobench(tmp_path, rng, h=96, w=96, dx=9, dy=5):
    """One translated case on disk + annotation dict (GeoBench schema)."""
    from PIL import Image

    s_img = _textured_image(rng, h, w)
    t_img = np.roll(s_img, shift=(dy, dx), axis=(0, 1))
    mask = np.zeros((h, w), np.uint8)
    mask[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 255
    paths = {}
    for name, arr in [("src.png", s_img), ("gen.png", t_img), ("mask.png", mask)]:
        p = str(tmp_path / name)
        Image.fromarray(arr).save(p)
        paths[name] = p
    data = {"da0": {"instances": {"ins0": {"case0": {
        "ori_img_path": paths["src.png"],
        "gen_img_path": paths["gen.png"],
        "ori_mask_path": paths["mask.png"],
        "edit_param": [dx, dy, 0, 0, 0, 0, 1, 1, 1],
        "obj_label": "object",
        "edit_prompt": "lightly move the object right",
    }}}}}
    return data, (dx, dy)


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
def test_compute_md_translate_near_zero(tmp_path, rng_np):
    """End-to-end MD loop with an exact-translation edit and patch
    descriptors: matched points land on the ground truth, MD ~ 0."""
    from freefine_tpu.metrics.md import compute_md

    data, _ = _write_mini_geobench(tmp_path, rng_np)
    md = compute_md(data, "gen_img_path", _patch_featurizer, verbose=False)
    assert np.isfinite(md)
    assert md < 2.0  # sub-keypoint-radius: matching recovered the shift


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
def test_md_cli_tiny_pipeline(tmp_path, rng_np):
    """--task 000000100 with the tiny random-weight SD backbone prints a
    finite number (wiring test for the DIFT path in the CLI)."""
    import json

    from freefine_tpu.metrics.main import main as metrics_main

    data, _ = _write_mini_geobench(tmp_path, rng_np, h=64, w=64, dx=4, dy=3)
    ann = tmp_path / "results.json"
    ann.write_text(json.dumps(data))
    result = metrics_main([
        "--path", str(ann), "--task", "000000100",
        "--sd-params", "random", "--sd-config", "tiny",
    ])
    assert result["MD"] is not None and np.isfinite(result["MD"])


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
