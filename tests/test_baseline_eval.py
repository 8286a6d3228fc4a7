"""End-to-end test of the shared baseline GeoBench driver on a synthetic
mini-dataset (the counterpart of the reference's per-baseline
eval_geobench.py scripts)."""

import json

import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.data.geobench import save_image
from freefine_tpu.pipeline import FreeFine


def _mini_annotations(tmp_path, n_edit=2):
    size = 64
    data = {}
    edits = {}
    for e in range(n_edit):
        rng = np.random.default_rng(e)
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        mask = np.zeros((size, size), np.uint8)
        mask[10:26, 10:26] = 255
        tgt = np.zeros((size, size), np.uint8)
        tgt[10:26, 20:36] = 255
        img_p = str(tmp_path / f"img_{e}.png")
        mask_p = str(tmp_path / f"mask_{e}.png")
        tgt_p = str(tmp_path / f"tgt_{e}.png")
        save_image(img, img_p)
        save_image(mask, mask_p)
        save_image(tgt, tgt_p)
        edits[str(e)] = {
            "edit_prompt": "lightly move the cup to the right",
            "edit_param": [10, 0, 0, 0, 0, 0, 1, 1, 1],
            "ori_img_path": img_p,
            "ori_mask_path": mask_p,
            "tgt_mask_path": tgt_p,
            "obj_label": "cup",
        }
    data["da0"] = {"instances": {"0": edits}}
    ann = tmp_path / "annotations_2d.json"
    ann.write_text(json.dumps(data))
    return str(ann)


@pytest.mark.slow
def test_baseline_eval_driver_region_drag(tmp_path):
    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path)
    dst = str(tmp_path / "out")

    merged = run_geobench_baseline(
        pipe, ann, dst, baseline="region_drag", steps=4, start_t=0.5,
        end_t=0.25,
    )
    cases = merged["da0"]["instances"]["0"]
    assert len(cases) == 2
    for c in cases.values():
        assert "gen_img_path" in c and "edit_seconds" in c
        import os.path as osp

        assert osp.exists(c["gen_img_path"])

    # resume: second run re-processes nothing
    merged2 = run_geobench_baseline(
        pipe, ann, dst, baseline="region_drag", steps=4,
    )
    assert len(merged2["da0"]["instances"]["0"]) == 2


@pytest.mark.slow
def test_baseline_eval_driver_geo_diffuser(tmp_path):
    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=1)
    dst = str(tmp_path / "out_gd")
    merged = run_geobench_baseline(
        pipe, ann, dst, baseline="geo_diffuser", steps=3,
    )
    assert len(merged["da0"]["instances"]["0"]) == 1
