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
    data["da0"] = {"4v_caption": "a cup on a table",
                   "instances": {"0": edits}}
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


def _assert_one_case_done(merged):
    import os.path as osp

    cases = merged["da0"]["instances"]["0"]
    assert len(cases) == 1
    c = next(iter(cases.values()))
    assert osp.exists(c["gen_img_path"]) and c["edit_seconds"] > 0
    return c


@pytest.mark.slow
def test_baseline_eval_driver_drag_diffusion(tmp_path):
    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=1)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_dd"), baseline="drag_diffusion",
        n_pix_step=2, train_lora_steps=1, lora_rank=2,
    )
    _assert_one_case_done(merged)


@pytest.mark.slow
def test_baseline_eval_driver_self_guidance(tmp_path):
    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=1)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_sg"), baseline="self_guidance",
        steps=3,
    )
    _assert_one_case_done(merged)


@pytest.mark.slow
def test_baseline_eval_driver_design_edit(tmp_path):
    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=1)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_de"), baseline="design_edit",
        steps=3,
    )
    _assert_one_case_done(merged)


@pytest.mark.slow
def test_baseline_eval_driver_motion_guidance(tmp_path):
    import jax
    import jax.numpy as jnp

    from freefine_tpu.baselines.eval import run_geobench_baseline
    from freefine_tpu.models.raft import RAFT, RAFTConfig

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    h = pipe.config.height
    raft = RAFT(config=RAFTConfig(iters=2))
    x = jnp.zeros((1, h, h, 3))
    raft_params = raft.init(jax.random.key(3), x, x)
    ann = _mini_annotations(tmp_path, n_edit=1)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_mg"), baseline="motion_guidance",
        runner_kwargs=dict(raft=raft, raft_params=raft_params),
        steps=3, num_recursive=2, guidance_weight=10.0,
    )
    _assert_one_case_done(merged)


@pytest.mark.slow
def test_baseline_eval_driver_diffusion_handles(tmp_path):
    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=1)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_dh"), baseline="diffusion_handles",
        runner_kwargs=dict(
            depth_fn=lambda img: np.full(img.shape[:2], 0.5, np.float32)
        ),
        steps=3, nti_iters=1, num_optsteps=1,
    )
    _assert_one_case_done(merged)


@pytest.mark.slow
def test_baseline_eval_driver_dragon_diffusion(tmp_path):
    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=1)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_dr"), baseline="dragon_diffusion",
        num_step=4, start_step=2, end_step=2,
    )
    _assert_one_case_done(merged)


@pytest.mark.slow
def test_baseline_eval_driver_design_edit_batched(tmp_path):
    """batch_size>1 routes design_edit through DesignEdit.move_batch
    (traced-shift case batching) and still writes every case."""
    import os.path as osp

    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=3)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_deb"), baseline="design_edit",
        steps=3, batch_size=2,
    )
    n = sum(
        1
        for da in merged.values()
        for ins in da["instances"].values()
        for v in ins.values()
        if osp.exists(v["gen_img_path"])
    )
    assert n == 3


@pytest.mark.slow
def test_baseline_eval_driver_self_guidance_batched(tmp_path):
    """batch_size>1 routes self_guidance through SelfGuidance.edit_batch
    (jit(vmap) case batching, traced silhouette transforms) and still
    writes every case, including the odd tail group."""
    import os.path as osp

    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=3)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_sgb"), baseline="self_guidance",
        steps=3, batch_size=2,
    )
    n = sum(
        1
        for da in merged.values()
        for ins in da["instances"].values()
        for v in ins.values()
        if osp.exists(v["gen_img_path"])
    )
    assert n == 3
