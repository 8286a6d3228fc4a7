"""One-command full-eval orchestrator smoke test (tiny, synthetic)."""

import json
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts"))


def _mini_meta(tmp_path, h=64):
    """annotations_2d.json + annotations_3d.json over one synthetic case."""
    from PIL import Image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (h, h, 3), dtype=np.uint8)
    img[20:32, 20:32] = 255
    img[24:28, 24:28] = 0
    mask = np.zeros((h, h), np.uint8)
    mask[16:48, 16:48] = 255
    pi = str(tmp_path / "src.png"); Image.fromarray(img).save(pi)
    pm = str(tmp_path / "mask.png"); Image.fromarray(mask).save(pm)
    case2d = {
        "ori_img_path": pi, "ori_mask_path": pm,
        "edit_param": [8, 0, 0, 0, 0, 0, 1, 1, 1],
        "obj_label": "object",
        "edit_prompt": "lightly move the object to the right",
    }
    case3d = {
        "ori_img_path": pi, "ori_mask_path": pm,
        "edit_param": [0, 0, 0, 0, 15, 0, 1, 1, 1],
        "obj_label": "object",
        "edit_prompt": "moderately rotate the object",
    }
    (tmp_path / "annotations_2d.json").write_text(
        json.dumps({"da0": {"instances": {"0": {"0": case2d}}}})
    )
    (tmp_path / "annotations_3d.json").write_text(
        json.dumps({"da0": {"instances": {"0": {"0": case3d}}}})
    )


@pytest.mark.slow
def test_full_eval_orchestrator_tiny(tmp_path):
    """bggen2d -> 2d -> bggen3d -> author3d -> 3d all chain from one
    command; every stage's artifact lands where the next expects it."""
    import run_full_eval

    _mini_meta(tmp_path)
    run_full_eval.main([
        "--dst-base", str(tmp_path), "--tiny",
        "--num-step", "4",
        "--stages", "bggen2d,2d,bggen3d,author3d,3d",
    ])
    assert osp.exists(tmp_path / "Geo-Bench-2D" / "inp_img_blended"
                      / "da0" / "0" / "inp_img.png")
    assert osp.exists(tmp_path / "generated_results_freefine_2d.json")
    assert osp.exists(tmp_path / "Geo-Bench-3D" / "inp_img_blended"
                      / "da0" / "0" / "inp_img.png")
    assert osp.exists(tmp_path / "annotations_3d_authored.json")
    for sub in ("coarse3d_depth_anything", "mesh_mask", "md_mask"):
        assert osp.exists(tmp_path / "Geo-Bench-3D" / sub / "da0" / "0"
                          / "0.png"), sub
    assert osp.exists(tmp_path / "Geo-Bench-3D" / "correspondence"
                      / "da0" / "0" / "0.npy")
    res3d = json.load(open(tmp_path / "generated_results_freefine_3d.json"))
    assert osp.exists(res3d["da0"]["instances"]["0"]["0"]["gen_img_path"])

    # resume: a second invocation re-processes nothing and still succeeds
    run_full_eval.main([
        "--dst-base", str(tmp_path), "--tiny", "--num-step", "4",
        "--stages", "bggen2d,2d,bggen3d,author3d,3d",
    ])
