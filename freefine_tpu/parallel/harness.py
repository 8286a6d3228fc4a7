"""Distributed GeoBench batch inference — the TPU-native replacement for the
reference's torchrun/NCCL harness (evaluation/FreeFine/
freefine_batch_infer_2d.py:139-265).

Mapping of mechanisms (SURVEY.md §5):

  torch.distributed.init_process_group('nccl')  -> jax.distributed.initialize
  DistributedSampler case sharding              -> deterministic round-robin
                                                   shard per (process, local
                                                   device)
  dist.all_gather_object result merge           -> multihost_utils.
                                                   process_allgather on JSON-
                                                   encoded payloads (gated to
                                                   single-process fallback)
  resume by output existence                    -> identical (GeoBenchDataset)

The editing compute itself is one cached jit per task config, so each worker
pays compilation once and then streams cases.
"""

from __future__ import annotations

import json
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


def maybe_initialize_distributed() -> tuple[int, int]:
    """(process_index, process_count); initialises jax.distributed when the
    standard cluster env vars are present."""
    import jax

    if jax.process_count() > 1:
        return jax.process_index(), jax.process_count()
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    return jax.process_index(), jax.process_count()


def _allgather_results(local: List[Dict]) -> List[List[Dict]]:
    """Gather per-process result lists on every host."""
    import jax

    if jax.process_count() == 1:
        return [local]
    from jax.experimental import multihost_utils

    payload = json.dumps(local)
    # Fixed-size uint8 buffer allgather (process_allgather handles arrays).
    data = np.frombuffer(payload.encode(), np.uint8)
    sizes = multihost_utils.process_allgather(np.array([data.size], np.int64))
    maxlen = int(sizes.max())
    buf = np.zeros(maxlen, np.uint8)
    buf[: data.size] = data
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for i in range(gathered.shape[0]):
        raw = bytes(gathered[i][: int(sizes[i, 0])]).decode()
        out.append(json.loads(raw))
    return out


def run_geobench_inference(
    pipe,
    annotations_json: str,
    dst_base: str,
    task: str = "2d",
    num_step: int = 50,
    start_step: Optional[int] = None,
    guidance_scale: float = 7.5,
    eta: float = 1.0,
    seed: int = 42,
    inp_img_dir: Optional[str] = None,
    results_name: Optional[str] = None,
    max_cases: Optional[int] = None,
    progress: Callable[[str], None] = print,
) -> Optional[Dict]:
    """Run FreeFine over GeoBench with case-level data parallelism.

    Reproduces the 2D harness defaults (freefine_batch_infer_2d.py:212-230):
    re-derives the coarse input on the fly via the 9-param `re_edit_2d`
    over the blended inpainted background, then calls `pipe.generation`
    with `use_auto_draw=True, reduce_inp_artifacts=True`.

    For task="3d" the 3D-depth harness conventions apply
    (freefine_batch_infer_3d_depth.py:75-197): precomputed coarse inputs,
    draw/mesh masks, default start_step 15.

    Returns the merged results dict on process 0 (None elsewhere).
    """
    if start_step is None:
        start_step = 15 if task == "3d" else 35
    pidx, pcount = maybe_initialize_distributed()
    gen_dir = osp.join(dst_base, f"Geo-Bench-{task.upper()}",
                       f"Gen_results_freefine_{task}")
    ds = GeoBenchDataset.from_json(annotations_json, gen_dir)
    my_cases = ds.shard(pidx, pcount)
    if max_cases is not None:
        my_cases = my_cases[:max_cases]
    progress(
        f"[proc {pidx}/{pcount}] {len(my_cases)} cases "
        f"({len(ds.existing_results)} already done)"
    )

    results: List[Dict] = []
    t0 = time.time()
    for i, case in enumerate(my_cases):
        case_t0 = time.time()
        da_n, ins_id, edit_ins = case["da_n"], case["ins_id"], case["edit_ins"]
        ori_img = read_image(ds.resolve(case["ori_img_path"]))
        ori_mask = read_mask(ds.resolve(case["ori_mask_path"]))
        if task == "3d":
            # 3D harness (freefine_batch_infer_3d_depth.py:118-162): reads
            # precomputed coarse3d images + draw/mesh masks; start_step 15,
            # use_auto_draw off with the user draw mask.
            coarse = read_image(
                ds.resolve(
                    case.get(
                        "coarse_input_path_0",
                        osp.join(dst_base, "coarse3d_depth_anything",
                                 da_n, ins_id, f"{edit_ins}.png"),
                    )
                )
            )
            target_mask = read_mask(ds.resolve(case["target_mask_0"]))
            draw_mask = read_mask(ds.resolve(case["draw_mask"]))
            out = pipe.generation(
                ori_img, ori_mask, coarse, target_mask,
                case.get("edit_prompt", ""),
                guidance_scale=guidance_scale, eta=eta,
                num_step=num_step, start_step=start_step,
                end_step=10, method_type="tca",
                draw_mask=draw_mask, use_auto_draw=False,
                seed=seed,
            )
        else:
            if inp_img_dir is not None:
                inp_bg = read_image(
                    osp.join(inp_img_dir, da_n, ins_id, "inp_img.png")
                )
            else:
                inp_bg = ori_img
            coarse, target_mask, _ = re_edit_2d(
                ori_img, ori_mask, case["edit_param"], inp_bg
            )
            out = pipe.generation(
                ori_img, ori_mask, coarse, target_mask,
                case.get("edit_prompt", ""),
                guidance_scale=guidance_scale, eta=eta,
                num_step=num_step, start_step=start_step,
                end_step=10, method_type="tca",
                use_auto_draw=True,
                cons_area=np.zeros_like(ori_mask),
                reduce_inp_artifacts=True,
                seed=seed,
            )
        path = ds.output_path(da_n, ins_id, edit_ins)
        save_image(out, path)
        results.append({
            **case, "gen_img_path": path,
            "edit_seconds": round(time.time() - case_t0, 3),
        })
        if (i + 1) % 10 == 0:
            rate = (i + 1) / (time.time() - t0) * 60
            progress(f"[proc {pidx}] {i+1}/{len(my_cases)} ({rate:.1f} edits/min)")

    gathered = _allgather_results(results)
    if pidx != 0:
        return None
    merged = ds.merge_results(gathered)
    out_path = osp.join(
        dst_base, results_name or f"generated_results_freefine_{task}.json"
    )
    save_json(merged, out_path)
    progress(f"[proc 0] wrote {out_path}")
    return merged
