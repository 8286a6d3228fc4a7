"""GeoBench dataset + distributed harness tests (synthetic mini-dataset)."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from freefine_tpu.data.geobench import (
    GeoBenchDataset,
    difficulty_level,
    filter_by_level,
    save_image,
)


def _mini_annotations(tmp_path, n_da=2, n_ins=2, n_edit=2):
    data = {}
    for d in range(n_da):
        instances = {}
        for i in range(n_ins):
            edits = {}
            for e in range(n_edit):
                img = np.random.default_rng(d * 10 + i).integers(
                    0, 255, (64, 64, 3), dtype=np.uint8
                )
                mask = np.zeros((64, 64), np.uint8)
                mask[10:30, 10:30] = 255
                img_p = str(tmp_path / f"img_{d}_{i}.png")
                mask_p = str(tmp_path / f"mask_{d}_{i}.png")
                save_image(img, img_p)
                save_image(mask, mask_p)
                adverb = ["lightly", "moderately", "heavily"][e % 3]
                edits[str(e)] = {
                    "edit_prompt": f"{adverb} move the cup to the right",
                    "edit_param": [10, 0, 0, 0, 0, 0, 1, 1, 1],
                    "ori_img_path": img_p,
                    "ori_mask_path": mask_p,
                    "obj_label": "cup",
                    "4v_caption": "a cup on a table",
                }
            instances[str(i)] = edits
        data[f"da{d}"] = {"instances": instances}
    ann = tmp_path / "annotations_2d.json"
    ann.write_text(json.dumps(data))
    return str(ann), data


def test_dataset_flatten_and_resume(tmp_path):
    ann, _ = _mini_annotations(tmp_path)
    dst = str(tmp_path / "gen")
    ds = GeoBenchDataset.from_json(ann, dst)
    assert len(ds) == 8 and not ds.existing_results

    # pre-create one output -> resumed
    p = ds.output_path("da0", "0", "0")
    save_image(np.zeros((64, 64, 3), np.uint8), p)
    ds2 = GeoBenchDataset.from_json(ann, dst)
    assert len(ds2) == 7 and len(ds2.existing_results) == 1


def test_shard_partition(tmp_path):
    ann, _ = _mini_annotations(tmp_path)
    ds = GeoBenchDataset.from_json(ann, str(tmp_path / "gen"))
    shards = [ds.shard(i, 3) for i in range(3)]
    assert sum(len(s) for s in shards) == len(ds)
    ids = [(c["da_n"], c["ins_id"], c["edit_ins"]) for s in shards for c in s]
    assert len(set(ids)) == len(ds)


def test_merge_results_schema(tmp_path):
    ann, data = _mini_annotations(tmp_path)
    ds = GeoBenchDataset.from_json(ann, str(tmp_path / "gen"))
    results = [dict(c, gen_img_path="x.png") for c in ds.shard(0, 2)]
    results2 = [dict(c, gen_img_path="y.png") for c in ds.shard(1, 2)]
    merged = ds.merge_results([results, results2])
    assert set(merged) == set(data)
    for da_n, da in data.items():
        for ins_id, ins in da["instances"].items():
            for e in ins:
                assert "gen_img_path" in merged[da_n]["instances"][ins_id][e]


def test_difficulty_levels():
    assert difficulty_level("lightly move it") == 1
    assert difficulty_level("Moderately rotate") == 2
    assert difficulty_level("heavily enlarge") == 3
    with pytest.raises(ValueError):
        difficulty_level("move it")


def test_filter_by_level(tmp_path):
    _, data = _mini_annotations(tmp_path)
    f = filter_by_level(json.loads(json.dumps(data)), 1)
    kept = [
        e for da in f.values() for ins in da["instances"].values() for e in ins
    ]
    assert kept and all(e == "0" for e in kept)  # edit 0 used "lightly"


@pytest.mark.slow
def test_harness_end_to_end(tmp_path):
    """Single-process harness over the mini dataset with the tiny pipeline."""
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_inference
    from freefine_tpu.pipeline import FreeFine

    ann, _ = _mini_annotations(tmp_path, n_da=1, n_ins=1, n_edit=2)
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    merged = run_geobench_inference(
        pipe, ann, str(tmp_path), task="2d",
        num_step=4, start_step=2, max_cases=2,
        progress=lambda s: None,
    )
    assert merged is not None
    paths = [
        v["gen_img_path"]
        for da in merged.values()
        for ins in da["instances"].values()
        for v in ins.values()
    ]
    assert len(paths) == 2 and all(osp.exists(p) for p in paths)
    assert osp.exists(tmp_path / "generated_results_freefine_2d.json")


@pytest.mark.slow
def test_harness_end_to_end_batched(tmp_path):
    """batch_size=2 over 3 cases: one full group + one padded tail group,
    through BatchedFreeFine with the exact 2D protocol args."""
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_inference
    from freefine_tpu.pipeline import FreeFine

    ann, _ = _mini_annotations(tmp_path, n_da=1, n_ins=1, n_edit=3)
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    merged = run_geobench_inference(
        pipe, ann, str(tmp_path), task="2d",
        num_step=4, start_step=2, batch_size=2,
        progress=lambda s: None,
    )
    assert merged is not None
    paths = [
        v["gen_img_path"]
        for da in merged.values()
        for ins in da["instances"].values()
        for v in ins.values()
    ]
    assert len(paths) == 3 and all(osp.exists(p) for p in paths)


def test_gaussian_blur_matches_cv2(rng_np):
    cv2 = pytest.importorskip("cv2")
    from freefine_tpu.parallel.harness import gaussian_blur_mask

    m = (rng_np.random((40, 40)) > 0.6).astype(np.float32)
    got = gaussian_blur_mask(m, 21)
    want = cv2.GaussianBlur(m, (21, 21), 0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_blend_background_soft_edge():
    from freefine_tpu.parallel.harness import blend_background

    ori = np.full((64, 64, 3), 200, np.uint8)
    gen = np.zeros((64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    out = blend_background(ori, gen, mask)
    assert (out[32, 32] == 0).all()          # inside: generated
    assert (out[2, 2] == 200).all()          # far outside: original
    halo = out[16:48, 13, 0].astype(int)     # just outside: soft
    assert (halo > 0).any() and (halo < 200).any()


@pytest.mark.slow
def test_harness_bggen_task(tmp_path):
    """bggen pass writes inp_img_blended/ + resumes by existence, and the 2D
    run consumes it via inp_img_dir."""
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.parallel.harness import (
        run_geobench_bggen,
        run_geobench_inference,
    )
    from freefine_tpu.pipeline import FreeFine

    ann, _ = _mini_annotations(tmp_path, n_da=1, n_ins=2, n_edit=1)
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    merged = run_geobench_bggen(
        pipe, ann, str(tmp_path), num_step=4, start_step=1, end_step=2,
        progress=lambda s: None,
    )
    assert merged is not None
    inp_dir = tmp_path / "Geo-Bench-2D" / "inp_img_blended"
    inps = [
        v["inp_img_path"]
        for da in merged.values()
        for v in da["instances"].values()
    ]
    assert len(inps) == 2 and all(osp.exists(p) for p in inps)
    assert all(str(inp_dir) in p for p in inps)

    # resume: second run does nothing new but reports both as done
    merged2 = run_geobench_bggen(
        pipe, ann, str(tmp_path), num_step=4, start_step=1, end_step=2,
        progress=lambda s: None,
    )
    assert len(merged2["da0"]["instances"]) == 2

    # the 2D task consumes the blended backgrounds
    out = run_geobench_inference(
        pipe, ann, str(tmp_path), task="2d",
        num_step=4, start_step=2, max_cases=1,
        inp_img_dir=str(inp_dir), progress=lambda s: None,
    )
    assert out is not None


@pytest.mark.slow
def test_harness_bggen_batched(tmp_path):
    """batch_size=2 routes through BatchedFreeFine with tail padding."""
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_bggen
    from freefine_tpu.pipeline import FreeFine

    ann, _ = _mini_annotations(tmp_path, n_da=1, n_ins=3, n_edit=1)
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    merged = run_geobench_bggen(
        pipe, ann, str(tmp_path), num_step=4, start_step=1, end_step=2,
        batch_size=2, progress=lambda s: None,
    )
    assert merged is not None and len(merged["da0"]["instances"]) == 3


@pytest.mark.slow
def test_harness_3d_task(tmp_path):
    """3D harness conventions: precomputed coarse + draw/mesh masks."""
    import json

    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_inference
    from freefine_tpu.pipeline import FreeFine

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    mask = np.zeros((64, 64), np.uint8); mask[20:40, 20:40] = 255
    coarse = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    paths = {}
    for n, a in (("img", img), ("mask", mask), ("coarse", coarse),
                 ("tmask", mask), ("draw", mask)):
        p = str(tmp_path / f"{n}.png")
        save_image(a, p)
        paths[n] = p
    data = {"da0": {"instances": {"0": {"0": {
        "edit_prompt": "moderately rotate the cup around the y-axis",
        "edit_param": [0, 0, 0, 0, 20, 0, 1, 1, 1],
        "ori_img_path": paths["img"], "ori_mask_path": paths["mask"],
        "coarse_input_path_0": paths["coarse"],
        "target_mask_0": paths["tmask"], "draw_mask": paths["draw"],
    }}}}}
    ann = str(tmp_path / "annotations_3d.json")
    json.dump(data, open(ann, "w"))

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    merged = run_geobench_inference(
        pipe, ann, str(tmp_path), task="3d", num_step=4, start_step=2,
        progress=lambda s: None,
    )
    case = merged["da0"]["instances"]["0"]["0"]
    assert osp.exists(case["gen_img_path"])
    assert case["edit_seconds"] > 0


def test_prefetch_order_depth_and_errors():
    """_prefetch yields fn(item) in order, runs at most `depth` ahead, and
    propagates loader exceptions at the failing item's position."""
    import threading
    import time as _time

    from freefine_tpu.parallel.harness import _prefetch

    started: list[int] = []
    gate = threading.Event()

    def slow(i):
        started.append(i)
        gate.wait(0.001)
        return i * 10

    out = list(_prefetch(range(6), slow, depth=2))
    assert out == [0, 10, 20, 30, 40, 50]
    assert started == list(range(6))

    # depth bound: before the first yield is consumed, at most depth+1
    # loads may have started
    started.clear()
    g = _prefetch(range(6), slow, depth=2)
    first = next(g)
    _time.sleep(0.05)
    assert first == 0 and len(started) <= 4
    g.close()

    def boom(i):
        if i == 2:
            raise ValueError("bad case")
        return i

    g = _prefetch(range(4), boom, depth=1)
    assert next(g) == 0 and next(g) == 1
    try:
        next(g)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


@pytest.mark.slow
def test_harness_end_to_end_shared_source(tmp_path):
    """shared_source=True groups edits of one da_n/ins_id through
    generation_shared_source (the reference stream runs once per group)."""
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_inference
    from freefine_tpu.pipeline import FreeFine

    ann, _ = _mini_annotations(tmp_path, n_da=1, n_ins=1, n_edit=3)
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    with pytest.raises(ValueError, match="batch_size"):
        run_geobench_inference(
            pipe, ann, str(tmp_path), task="2d", num_step=4, start_step=2,
            shared_source=True, progress=lambda s: None,
        )
    merged = run_geobench_inference(
        pipe, ann, str(tmp_path), task="2d",
        num_step=4, start_step=2, batch_size=2, shared_source=True,
        progress=lambda s: None,
    )
    assert merged is not None
    paths = [
        v["gen_img_path"]
        for da in merged.values()
        for ins in da["instances"].values()
        for v in ins.values()
    ]
    assert len(paths) == 3 and all(osp.exists(p) for p in paths)


@pytest.mark.slow
def test_harness_bggen_shared_source(tmp_path):
    """shared_source groups instances by source image and routes through
    background_generation_shared_source (one inversion + one reference
    pass per step per group)."""
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_bggen
    from freefine_tpu.pipeline import FreeFine

    ann, _ = _mini_annotations(tmp_path, n_da=1, n_ins=3, n_edit=1)
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    merged = run_geobench_bggen(
        pipe, ann, str(tmp_path), num_step=4, start_step=1, end_step=2,
        batch_size=2, shared_source=True, progress=lambda s: None,
    )
    assert merged is not None and len(merged["da0"]["instances"]) == 3
    for v in merged["da0"]["instances"].values():
        assert osp.exists(v["inp_img_path"])
