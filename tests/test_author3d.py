"""GeoBench-3D authoring tests: geodiff warp ops + driver + e2e chain."""

import json
import os.path as osp

import numpy as np
import pytest

from freefine_tpu.ops.geodiff_warp import (
    author_case,
    geodiff_transform_matrix,
    normalize_depth,
)


def _scene(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 255
    bg = np.full((h, w, 3), 17, np.uint8)
    return img, mask, bg


IDENTITY = [0, 0, 0, 0, 0, 0, 1, 1, 1]


def test_transform_matrix_identity():
    np.testing.assert_allclose(
        geodiff_transform_matrix(IDENTITY), np.eye(4), atol=1e-7
    )


def test_transform_matrix_translation_normalised():
    m = geodiff_transform_matrix([16, -8, 4, 0, 0, 0, 1, 1, 1], length=64)
    np.testing.assert_allclose(m[:3, 3], [0.25, -0.125, 0.0625])
    np.testing.assert_allclose(m[:3, :3], np.eye(3))


def test_transform_matrix_rotation_order():
    # T @ S @ Rx @ Ry @ Rz (ui_utils2.py:709-735): scale is NOT rotated
    m = geodiff_transform_matrix([0, 0, 0, 0, 0, 90, 2, 1, 1])
    # Rz(90): (1,0,0) -> (0,1,0); then scale x by 2 leaves y untouched
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-6)
    # (0,1,0) -> (-1,0,0) then x*2 -> (-2,0,0)
    np.testing.assert_allclose(m[:3, :3] @ [0, 1, 0], [-2, 0, 0], atol=1e-6)


def test_normalize_depth_constant_mode():
    d, valid = normalize_depth(np.full((8, 8), 0.5))
    np.testing.assert_allclose(d, 0.5)
    np.testing.assert_allclose(valid, 1.0)


def test_normalize_depth_far_plane():
    d = np.linspace(1.0, 10.0, 64).reshape(8, 8)
    dn, valid = normalize_depth(d)
    assert dn.max() == 1.0
    assert valid[dn >= 0.95].sum() == 0
    assert (dn >= 0) .all() and (dn <= 1).all()


def test_identity_warp_roundtrip():
    """Identity transform: coords = pixel grid, mask preserved, coarse is
    the image inside the mask and the background outside."""
    img, mask, bg = _scene()
    depth = np.full((64, 64), 0.5, np.float32)
    coarse, full, mesh, md, coords = author_case(
        img, mask, depth, bg, IDENTITY, focal_length=68.75,
    )
    rr, cc = np.mgrid[0:64, 0:64]
    np.testing.assert_allclose(coords[..., 0], cc, atol=1e-4)
    np.testing.assert_allclose(coords[..., 1], rr, atol=1e-4)
    np.testing.assert_array_equal(full > 0, mask > 0)
    assert (coarse[mask > 0] == img[mask > 0]).all()
    assert (coarse[mask == 0] == bg[mask == 0]).all()
    # mesh footprint covers the mask interior, stays inside the mask
    interior = np.zeros_like(mask)
    interior[17:47, 17:47] = 255
    assert (mesh[interior > 0] > 0).all()
    assert (mesh[mask == 0] == 0).all()
    # md = splat coverage the mesh does not explain
    np.testing.assert_array_equal(md, np.where(mesh > 0, 0, full))


def test_translation_shift_amount():
    """Pure x-translation at constant depth 0.5: pixel shift is
    (tx/length) * focal / z (the reference's camera-unit translation)."""
    img, mask, bg = _scene()
    depth = np.full((64, 64), 0.5, np.float32)
    tx = 8.0
    _, _, _, _, coords = author_case(
        img, mask, depth, bg, [tx, 0, 0, 0, 0, 0, 1, 1, 1],
        focal_length=68.75,
    )
    rr, cc = np.mgrid[0:64, 0:64]
    shift = (tx / 64.0) * 68.75 / 0.5
    np.testing.assert_allclose(coords[..., 0], cc + shift, atol=1e-3)
    np.testing.assert_allclose(coords[..., 1], rr, atol=1e-3)


def test_rotation_warp_moves_mask():
    """y-rotation with a depth gradient produces a displaced mask and a
    nonempty mesh footprint covering it."""
    img, mask, bg = _scene()
    depth = (0.4 + 0.4 * np.linspace(0, 1, 64)[None, :]
             * np.ones((64, 1))).astype(np.float32)
    coarse, full, mesh, md, coords = author_case(
        img, mask, depth, bg, [0, 0, 0, 0, 25, 0, 1, 1, 1],
        focal_length=68.75,
    )
    assert full.sum() > 0 and mesh.sum() > 0
    assert (full > 0).any() and not np.array_equal(full > 0, mask > 0)
    # in-mask coords moved
    moved = np.abs(coords[mask > 0][:, 0]
                   - np.mgrid[0:64, 0:64][1][mask > 0])
    assert moved.mean() > 0.5


def _mini_3d_annotations(tmp_path, n_edit=2, h=64):
    """Textured source + mask + a 3D-only edit_param per case."""
    from PIL import Image

    rng = np.random.default_rng(3)
    g = rng.random((h, h)) * 255
    for _ in range(3):
        g = (g + np.roll(g, 1, 0) + np.roll(g, 1, 1)
             + np.roll(g, -1, 0) + np.roll(g, -1, 1)) / 5
    g = (g - g.min()) / (g.max() - g.min())
    img = (np.stack([g, 1 - g, g * g], -1) * 255).astype(np.uint8)
    mask = np.zeros((h, h), np.uint8)
    mask[h // 4: 3 * h // 4, h // 4: 3 * h // 4] = 255
    # strong corners inside the mask so ORB's keypoint fallback fires
    img[h // 3: h // 2, h // 3: h // 2] = 255
    img[h // 3 + 4: h // 2 - 4, h // 3 + 4: h // 2 - 4] = 0
    pi = str(tmp_path / "src.png"); Image.fromarray(img).save(pi)
    pm = str(tmp_path / "mask.png"); Image.fromarray(mask).save(pm)
    edits = {
        str(i): {
            "ori_img_path": pi, "ori_mask_path": pm,
            "edit_param": [0, 0, 0, 0, 10.0 + 5 * i, 0, 1, 1, 1],
            "obj_label": "object",
            "edit_prompt": "moderately rotate the object",
        }
        for i in range(n_edit)
    }
    data = {"da0": {"instances": {"ins0": edits}}}
    ann = str(tmp_path / "annotations_3d.json")
    json.dump(data, open(ann, "w"))
    return ann, data


def test_author3d_driver_outputs(tmp_path):
    """Driver writes all four artifacts per case in the reference layout,
    fills the annotation fields, and resumes by existence."""
    from freefine_tpu.data.author3d import run_geobench_author3d

    ann, _ = _mini_3d_annotations(tmp_path)
    calls = []

    def depth_fn(img):
        calls.append(1)
        return np.full(img.shape[:2], 0.5, np.float32)

    merged = run_geobench_author3d(
        ann, str(tmp_path), depth_fn=depth_fn, focal_length=68.75,
        size=64, progress=lambda s: None,
    )
    assert merged is not None
    base = tmp_path / "Geo-Bench-3D"
    for e in ("0", "1"):
        case = merged["da0"]["instances"]["ins0"][e]
        assert case["coarse_input_path_0"] == str(
            base / "coarse3d_depth_anything" / "da0" / "ins0" / f"{e}.png")
        assert case["target_mask_0"] == str(
            base / "mesh_mask" / "da0" / "ins0" / f"{e}.png")
        assert case["draw_mask"] == str(
            base / "md_mask" / "da0" / "ins0" / f"{e}.png")
        for k in ("coarse_input_path_0", "target_mask_0", "draw_mask",
                  "correspondence_path"):
            assert osp.exists(case[k]), (e, k)
        corr = np.load(case["correspondence_path"])
        assert corr.shape == (64, 64, 2)
    # depth was computed once per source image (cache), not per case
    assert len(calls) == 1
    assert osp.exists(tmp_path / "annotations_3d_authored.json")

    # resume: nothing recomputed, all cases reported as done
    merged2 = run_geobench_author3d(
        ann, str(tmp_path), depth_fn=depth_fn, focal_length=68.75,
        size=64, progress=lambda s: None,
    )
    assert len(calls) == 1
    assert len(merged2["da0"]["instances"]["ins0"]) == 2


@pytest.mark.slow
def test_author3d_to_inference_to_md_chain(tmp_path):
    """The VERDICT round-3 done-condition: author3d -> task='3d'
    inference -> MD-3D metric, end to end on synthetic inputs."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841  (SIFT for MD)
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.data.author3d import run_geobench_author3d
    from freefine_tpu.metrics.md import compute_md
    from freefine_tpu.parallel.harness import run_geobench_inference
    from freefine_tpu.pipeline import FreeFine

    # 128^2 sources: cv2.ORB's default 31-px edge exclusion leaves no
    # eligible keypoints on a 64^2 image
    ann, _ = _mini_3d_annotations(tmp_path, n_edit=1, h=128)
    authored = run_geobench_author3d(
        ann, str(tmp_path),
        depth_fn=lambda img: np.full(img.shape[:2], 0.5, np.float32),
        focal_length=137.5, size=128, progress=lambda s: None,
    )
    ann2 = str(tmp_path / "annotations_3d_authored.json")
    assert osp.exists(ann2)

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    merged = run_geobench_inference(
        pipe, ann2, str(tmp_path), task="3d",
        num_step=4, start_step=2, progress=lambda s: None,
    )
    case = merged["da0"]["instances"]["ins0"]["0"]
    assert osp.exists(case["gen_img_path"])

    # MD over the generated results, 3D ground truth from the authored .npy
    from tests.test_md_dift import _patch_featurizer

    md = compute_md(merged, "gen_img_path", _patch_featurizer,
                    verbose=False)
    assert np.isfinite(md)


def test_harness_dispatch_author3d(tmp_path, monkeypatch):
    """run_geobench_inference(task='author3d') routes to the authoring
    driver (pipe-free)."""
    from freefine_tpu.parallel import harness

    called = {}

    def fake(ann, dst, max_cases=None, progress=print, **kw):
        called["args"] = (ann, dst, max_cases)
        return {"ok": True}

    import freefine_tpu.data.author3d as a3d

    monkeypatch.setattr(a3d, "run_geobench_author3d", fake)
    out = harness.run_geobench_inference(
        None, "ann.json", str(tmp_path), task="author3d", max_cases=5,
        progress=lambda s: None,
    )
    assert out == {"ok": True}
    assert called["args"] == ("ann.json", str(tmp_path), 5)
