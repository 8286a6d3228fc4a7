"""GeoBench eval driver for the baseline-method cores.

The reference gives every baseline its own `eval_geobench.py` with the same
loop shape (load annotations -> iterate cases -> edit -> save ->
results JSON, e.g. evaluation/RegionDrag/eval_geobench.py:86-125).  This
module is the shared TPU-side driver: case-level sharding across processes,
output-existence resume, and result allgather, exactly like the FreeFine
harness (freefine_tpu.parallel.harness).

    python -m freefine_tpu.baselines.eval --baseline region_drag \
        --annotations .../annotation_2d.json --dst results/ [--weights DIR]
"""

from __future__ import annotations

import os.path as osp
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from freefine_tpu.data.geobench import (
    GeoBenchDataset,
    read_image,
    read_mask,
    save_image,
    save_json,
)
from freefine_tpu.ops.geometry import re_edit_2d
from freefine_tpu.parallel.harness import (
    _allgather_results,
    maybe_initialize_distributed,
)


def _drag_points_from_case(ori_mask, tgt_mask, edit_param, n_points=30,
                           seed=42):
    """DragDiffusion's GeoBench point protocol
    (DragDiffusion/geobench_eval.py:107-146): sample <= 30 handle points
    from the source mask, targets are their analytic transforms."""
    from freefine_tpu.metrics.md import transform_coordinates

    size = ori_mask.shape[:2]
    coords_yx = np.argwhere(ori_mask > 0)
    if len(coords_yx) == 0:
        return np.zeros((0, 2)), np.zeros((0, 2))
    if len(coords_yx) > n_points:
        rng = np.random.default_rng(seed)
        coords_yx = coords_yx[
            rng.choice(len(coords_yx), size=n_points, replace=False)
        ]
    gt = transform_coordinates(edit_param, size, (ori_mask > 0).astype(float))
    handles_xy = coords_yx[:, ::-1].astype(np.float64)
    tgts_rc = gt[coords_yx[:, 0], coords_yx[:, 1]]
    targets_xy = tgts_rc[:, ::-1]
    ok = (
        (targets_xy[:, 0] >= 0) & (targets_xy[:, 0] < size[1])
        & (targets_xy[:, 1] >= 0) & (targets_xy[:, 1] < size[0])
    )
    return handles_xy[ok], targets_xy[ok]


ALL_BASELINES = (
    "region_drag", "self_guidance", "drag_diffusion", "design_edit",
    "geo_diffuser", "motion_guidance", "diffusion_handles",
    "dragon_diffusion",
)

# baselines with a case-batched jit(vmap) lane in their core
BATCHED_BASELINES = ("region_drag", "design_edit", "self_guidance")


def _run_batched_lane(ds, my_cases, batch_size, baseline, dst_base, pidx,
                      progress, run_group):
    """Shared skeleton of the case-batched lanes: pad the tail group so
    every group hits one compiled program, run `run_group(padded_cases) ->
    outs`, then save/gather/merge exactly like the batch-1 loop."""
    results: List[Dict] = []
    t0 = time.time()
    for b0 in range(0, len(my_cases), batch_size):
        group = my_cases[b0: b0 + batch_size]
        padded = group + [group[-1]] * (batch_size - len(group))
        case_t0 = time.time()
        outs = run_group(padded)
        per_case = (time.time() - case_t0) / len(group)
        for case, out in zip(group, outs):
            path = ds.output_path(
                case["da_n"], case["ins_id"], case["edit_ins"]
            )
            save_image(out, path)
            results.append({
                **case, "gen_img_path": path,
                "edit_seconds": round(per_case, 3),
            })
        done_n = min(b0 + batch_size, len(my_cases))
        rate = done_n / (time.time() - t0) * 60
        progress(f"[proc {pidx}] {done_n}/{len(my_cases)} "
                 f"({rate:.1f} edits/min, batch {batch_size})")
    gathered = _allgather_results(results)
    if pidx != 0:
        return None
    merged = ds.merge_results(gathered)
    out_path = osp.join(dst_base, f"generated_results_{baseline}.json")
    save_json(merged, out_path)
    progress(f"[proc 0] wrote {out_path}")
    return merged


def run_geobench_baseline(
    pipe,
    annotations_json: str,
    dst_base: str,
    baseline: str = "region_drag",
    max_cases: Optional[int] = None,
    seed: int = 42,
    batch_size: int = 1,
    progress: Callable[[str], None] = print,
    runner_kwargs: Optional[Dict] = None,
    **baseline_kwargs,
) -> Optional[Dict]:
    """Run a baseline core over GeoBench.  Per-baseline protocols:

    region_drag  : dense region pair from (ori, tgt) masks, full-frame mask
                   (RegionDrag/eval_geobench.py:94-120).
    self_guidance: silhouette guidance from edit_param, prompt
                   "image of {obj_label}" (SelfGuidance/eval_geobench.py:
                   131-146).
    drag_diffusion: <= 30 mask-sampled handles -> analytic targets, union
                   mask, per-image LoRA (DragDiffusion/geobench_eval.py:
                   107-206).
    motion_guidance: analytic target flow from edit_param over the source
                   mask, prompt = the image's 4v_caption
                   (MotionGuidance/eval_geobench.py:29-61,113-147).
    diffusion_handles: Depth-Anything depth normalised d/max + 1e-2 with
                   the far plane snapped to 1.0 and the foreground fixed to
                   the 0.5 plane for 2D transforms, prompt ""
                   (DiffusionHandles/eval_geobench.py:395-443).
    dragon_diffusion: DragonDiffusion-parity feature-energy guidance over
                   the FreeFine coarse edit (pipe.guided_generation; the
                   reference drives run_move with the mask centroid as the
                   single drag point, DragonDiffusion/eval_geobench.py:
                   15-45).

    `runner_kwargs` feeds the runner constructor (e.g. raft/raft_params
    for motion_guidance, depth_fn for diffusion_handles);
    `baseline_kwargs` feeds the per-case edit call.
    """
    assert baseline in ALL_BASELINES, baseline
    runner_kwargs = dict(runner_kwargs or {})
    pidx, pcount = maybe_initialize_distributed()
    gen_dir = osp.join(dst_base, f"Gen_results_{baseline}")
    ds = GeoBenchDataset.from_json(annotations_json, gen_dir)
    my_cases = ds.shard(pidx, pcount)
    if max_cases is not None:
        my_cases = my_cases[:max_cases]
    progress(
        f"[proc {pidx}/{pcount}] baseline={baseline} {len(my_cases)} cases "
        f"({len(ds.existing_results)} already done)"
    )

    if baseline == "region_drag":
        from freefine_tpu.baselines.region_drag import RegionDrag

        runner = RegionDrag(pipe)
    elif baseline == "self_guidance":
        from freefine_tpu.baselines.self_guidance import SelfGuidance

        runner = SelfGuidance(pipe)
    elif baseline == "design_edit":
        from freefine_tpu.baselines.design_edit import DesignEdit

        runner = DesignEdit(pipe)
    elif baseline == "geo_diffuser":
        from freefine_tpu.baselines.geo_diffuser import GeoDiffuser

        runner = GeoDiffuser(pipe)
    elif baseline == "motion_guidance":
        from freefine_tpu.baselines.motion_guidance import MotionGuidance

        raft = runner_kwargs.pop("raft", None)
        raft_params = runner_kwargs.pop("raft_params", None)
        if raft is None:
            import jax
            import jax.numpy as jnp

            from freefine_tpu.models.raft import RAFT, RAFTConfig

            raft = RAFT(config=RAFTConfig())
            x = jnp.zeros((1, pipe.config.height, pipe.config.width, 3))
            raft_params = raft.init(jax.random.key(0), x, x)
        runner = MotionGuidance(pipe, raft, raft_params)
    elif baseline == "diffusion_handles":
        from freefine_tpu.baselines.diffusion_handles import DiffusionHandles

        dh_depth_fn = runner_kwargs.pop("depth_fn", None)
        if dh_depth_fn is None:
            from freefine_tpu.data.author3d import make_depth_fn

            dh_depth_fn = make_depth_fn("depth_anything")
        runner = DiffusionHandles(pipe)
    elif baseline == "dragon_diffusion":
        runner = pipe  # drives pipe.guided_generation directly
    else:
        from freefine_tpu.baselines.drag_diffusion import DragDiffusion

        runner = DragDiffusion(pipe)

    size = pipe.config.height

    if baseline == "region_drag" and batch_size > 1:
        # case-batched lane (RegionDrag.drag_batch) — beyond the
        # reference's batch-1 eval; pads the tail group and fixes the
        # point count so every group hits one compiled program
        from freefine_tpu.baselines.region_drag import region_pair_to_pts

        lh, lw = pipe.config.latent_height, pipe.config.latent_width
        n_pts = int(2 ** np.ceil(np.log2(max(lh * lw, 2))))

        def run_group(padded):
            items, prompts = [], []
            for case in padded:
                gi = read_image(ds.resolve(case["ori_img_path"]), size=size)
                gm = read_mask(ds.resolve(case["ori_mask_path"]), size=size)
                gt = read_mask(ds.resolve(case["tgt_mask_path"]), size=size)
                s, t = region_pair_to_pts(gm, gt, scale=1 / 8)
                # full-frame mask, exactly like the batch-1 lane and the
                # reference (eval_geobench.py:107 mask = ones_like)
                items.append(dict(
                    ori_image=gi, source_pts=s * 8, target_pts=t * 8,
                ))
                prompts.append(f"image of {case.get('obj_label', 'object')}")
            return runner.drag_batch(
                # per-case seeds: every case draws the keys the batch-1
                # lane uses (reference protocol fixes one seed per case)
                items, prompts, seed=[seed] * len(items), max_pts=n_pts,
                **baseline_kwargs
            )

        return _run_batched_lane(ds, my_cases, batch_size, baseline,
                                 dst_base, pidx, progress, run_group)

    if baseline == "design_edit" and batch_size > 1:
        # case-batched lane (DesignEdit.move_batch): the per-case (dx, dy)
        # ride the program as traced offsets, so every group shares one
        # compiled inversion + denoise scan (beyond the reference's
        # batch-1 eval, DesignEdit/eval_geobench.py)
        def run_group(padded):
            imgs, msks, moves, prompts = [], [], [], []
            for case in padded:
                gi = read_image(ds.resolve(case["ori_img_path"]), size=size)
                gm = read_mask(ds.resolve(case["ori_mask_path"]), size=size)
                p = case["edit_param"]
                imgs.append(gi)
                msks.append(gm)
                moves.append((
                    float(p[0]) / gi.shape[1], -float(p[1]) / gi.shape[0]
                ))
                prompts.append(f"image of {case.get('obj_label', 'object')}")
            return runner.move_batch(
                imgs, msks, moves, prompts, **baseline_kwargs
            )

        return _run_batched_lane(ds, my_cases, batch_size, baseline,
                                 dst_base, pidx, progress, run_group)

    if baseline == "self_guidance" and batch_size > 1:
        # case-batched lane (SelfGuidance.edit_batch): inversion, sow and
        # guided grad scans run once per group, with each case's
        # silhouette transform riding as traced values (beyond the
        # reference's batch-1 eval, SelfGuidance/eval_geobench.py:131-146)
        def run_group(padded):
            imgs, prompts, objs, params = [], [], [], []
            for case in padded:
                imgs.append(
                    read_image(ds.resolve(case["ori_img_path"]), size=size)
                )
                obj = case.get("obj_label", "object")
                prompts.append(f"image of {obj}")
                objs.append(obj)
                params.append(case["edit_param"])
            return runner.edit_batch(
                imgs, prompts, objs, params, seed=[seed] * len(padded),
                **baseline_kwargs
            )

        return _run_batched_lane(ds, my_cases, batch_size, baseline,
                                 dst_base, pidx, progress, run_group)

    results: List[Dict] = []
    t0 = time.time()
    for i, case in enumerate(my_cases):
        case_t0 = time.time()
        da_n, ins_id, edit_ins = case["da_n"], case["ins_id"], case["edit_ins"]
        ori_img = read_image(ds.resolve(case["ori_img_path"]), size=size)
        ori_mask = read_mask(ds.resolve(case["ori_mask_path"]), size=size)
        tgt_mask = (
            read_mask(ds.resolve(case["tgt_mask_path"]), size=size)
            if "tgt_mask_path" in case else None
        )
        prompt = f"image of {case.get('obj_label', 'object')}"

        if baseline == "region_drag":
            # eval_geobench.py:102-118: target mask doubles as the source
            # region when the annotation's masks are aligned; the reference
            # passes (orig_mask, tgt_mask) region pair and a full-frame mask
            out = runner.drag_regions(
                ori_img, ori_mask, tgt_mask, prompt, seed=seed,
                **baseline_kwargs,
            )
        elif baseline == "self_guidance":
            out = runner.edit(
                ori_img, prompt, case.get("obj_label", "object"),
                case["edit_param"], seed=seed, **baseline_kwargs,
            )
        elif baseline == "geo_diffuser":
            out = runner.edit(
                ori_img, ori_mask, case["edit_param"], prompt="",
                **baseline_kwargs,
            )
        elif baseline == "design_edit":
            # translation edits as layer moves (dx/dy pixels -> fractions)
            p = case["edit_param"]
            h_img, w_img = ori_img.shape[:2]
            out = runner.move(
                ori_img, ori_mask,
                dx=float(p[0]) / w_img, dy=-float(p[1]) / h_img,
                prompt=prompt, **baseline_kwargs,
            )
        elif baseline == "motion_guidance":
            # eval_geobench.py:113-147: caption prompt, analytic flow
            out = runner.edit(
                ori_img, case["edit_param"], ori_mask,
                case.get("4v_caption", ""), seed=seed, **baseline_kwargs,
            )
        elif baseline == "diffusion_handles":
            # eval_geobench.py:395-417: normalised depth, planar foreground
            d = np.asarray(dh_depth_fn(ori_img), np.float32)
            d = d / (d.max() + 1e-8) + 1e-2
            d[d > 0.95] = 1.0
            d[ori_mask > 127] = 0.5  # is_2D_transform: planar fg depth
            out = runner.edit(
                ori_img, d, ori_mask, case["edit_param"], prompt="",
                **baseline_kwargs,
            )
        elif baseline == "dragon_diffusion":
            # the reference moves the mask centroid by (dx, dy) with
            # run_move (eval_geobench.py:33-45); our parity path applies
            # the same edit as feature-energy guidance over the coarse
            # 2D warp
            coarse, dd_target, _ = re_edit_2d(
                ori_img, ori_mask, case["edit_param"], ori_img
            )
            out = runner.guided_generation(
                ori_img, ori_mask, coarse, dd_target,
                case.get("4v_caption", ""),
                cons_area=dd_target, seed=seed, **baseline_kwargs,
            )
        else:
            handles, targets = _drag_points_from_case(
                ori_mask, tgt_mask, case["edit_param"], seed=seed
            )
            union = ((ori_mask > 0) | (tgt_mask > 0)).astype(np.float32)
            out = runner.drag(
                ori_img, handles, targets, prompt, mask=union, seed=seed,
                max_points=32, **baseline_kwargs,
            )

        path = ds.output_path(da_n, ins_id, edit_ins)
        save_image(out, path)
        results.append({
            **case, "gen_img_path": path,
            "edit_seconds": round(time.time() - case_t0, 3),
        })
        if (i + 1) % 10 == 0:
            rate = (i + 1) / (time.time() - t0) * 60
            progress(f"[proc {pidx}] {i+1}/{len(my_cases)} "
                     f"({rate:.1f} edits/min)")

    gathered = _allgather_results(results)
    if pidx != 0:
        return None
    merged = ds.merge_results(gathered)
    out_path = osp.join(dst_base, f"generated_results_{baseline}.json")
    save_json(merged, out_path)
    progress(f"[proc 0] wrote {out_path}")
    return merged


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="GeoBench baseline runner")
    ap.add_argument("--baseline", default="region_drag",
                    choices=list(ALL_BASELINES))
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--weights", default=None,
                    help="orbax SD checkpoint dir (random weights if unset)")
    ap.add_argument("--config", default="sd15", choices=["sd15", "tiny"])
    ap.add_argument("--max-cases", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch", type=int, default=1,
                    help="cases per compiled batch "
                         f"({'/'.join(BATCHED_BASELINES)} only)")
    ap.add_argument("--raft-params", default=None,
                    help="motion_guidance: RAFT msgpack params "
                         "(random-init otherwise)")
    ap.add_argument("--depth-params", default=None,
                    help="diffusion_handles: Depth-Anything msgpack params")
    args = ap.parse_args(argv)

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine, load_pipeline_params
    from freefine_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = tiny_pipeline_config() if args.config == "tiny" else sd15_pipeline_config()
    pipe = FreeFine(config=cfg, init_random=True, tokenizer_path=args.weights)
    if args.weights:
        load_pipeline_params(pipe, args.weights)

    runner_kwargs = {}
    if args.baseline == "motion_guidance" and args.raft_params:
        import flax.serialization

        from freefine_tpu.models.raft import RAFT, RAFTConfig

        raft = RAFT(config=RAFTConfig())
        with open(args.raft_params, "rb") as f:
            raft_params = flax.serialization.msgpack_restore(f.read())
        runner_kwargs = dict(raft=raft, raft_params=raft_params)
    elif args.baseline == "diffusion_handles" and args.depth_params:
        from freefine_tpu.data.author3d import make_depth_fn

        runner_kwargs = dict(
            depth_fn=make_depth_fn("depth_anything", args.depth_params)
        )

    run_geobench_baseline(
        pipe, args.annotations, args.dst, baseline=args.baseline,
        max_cases=args.max_cases, seed=args.seed, batch_size=args.batch,
        runner_kwargs=runner_kwargs,
    )


if __name__ == "__main__":
    main()
