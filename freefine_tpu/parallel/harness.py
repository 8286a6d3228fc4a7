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


def _prefetch(items, fn, depth: int = 2):
    """Yield `fn(item)` in order, computing up to `depth` items ahead on a
    background thread, so host-side case loading (PNG decode + the native
    C++ resize/dilate, all GIL-releasing) overlaps the device's edit scan.
    The reference gets the same overlap from torch DataLoader workers
    (freefine_batch_infer_2d.py:167-173)."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    it = iter(items)
    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = deque()
        for item in it:
            pending.append(ex.submit(fn, item))
            if len(pending) > depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


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
        except (RuntimeError, ValueError) as e:
            # already initialised, or an incomplete cluster spec — fall back
            # to single-process but SAY so (a silent pass here masked real
            # cluster misconfiguration)
            import warnings

            warnings.warn(f"jax.distributed.initialize failed: {e}")
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


def gaussian_blur_mask(mask01: np.ndarray, ksize: int = 21) -> np.ndarray:
    """cv2.GaussianBlur(mask, (k, k), 0) on a [H, W] float mask: cv2's
    sigma-from-ksize rule (0.3*((k-1)*0.5 - 1) + 0.8) and REFLECT_101
    borders, as a separable host-side convolution."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = (ksize - 1) // 2
    x = np.arange(ksize, dtype=np.float64) - r
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    k /= k.sum()
    m = mask01.astype(np.float64)
    m = np.pad(m, ((r, r), (0, 0)), mode="reflect")
    m = np.apply_along_axis(lambda v: np.convolve(v, k, mode="valid"), 0, m)
    m = np.pad(m, ((0, 0), (r, r)), mode="reflect")
    m = np.apply_along_axis(lambda v: np.convolve(v, k, mode="valid"), 1, m)
    return m.astype(np.float32)


def blend_background(
    ori_img: np.ndarray, gen_img: np.ndarray, mask01: np.ndarray,
    ksize: int = 21,
) -> np.ndarray:
    """BrushNet-style blended paste of the regenerated background
    (freefine_batch_infer_bggen_2d.py:186-190, Partial-editing.ipynb).

    Documented deviation: the reference divides the blurred 0/1 mask by 255
    (a leftover from a 0..255-scaled mask), which collapses the soft halo to
    ~0 and degenerates to a hard paste; here the blur output stays in [0,1]
    so the blend is actually soft — the BrushNet intent.
    """
    mb = gaussian_blur_mask(mask01, ksize)
    m = (1.0 - (1.0 - mask01) * (1.0 - mb))[..., None]
    out = ori_img.astype(np.float32) * (1.0 - m) + gen_img.astype(np.float32) * m
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _instance_seed(seed: int, da_n: str, ins_id: str) -> int:
    """Per-instance seed: the reference draws random.randint(0, 1e16) "to
    bring more diversity to background gen" (bggen_2d.py:165); we derive it
    deterministically so runs are reproducible AND diverse."""
    import zlib

    return zlib.crc32(f"{seed}/{da_n}/{ins_id}".encode()) & 0x7FFFFFFF


def _bucket_size(n: int, batch_size: int) -> int:
    """Smallest power of two >= n, capped at batch_size.

    Shared-source groups follow per-source instance counts (GeoBench:
    ~1-10 per image), so padding every group to the full compiled batch
    wastes most lanes on small sources (a 2-instance group at batch 8
    would run 6 duplicate lanes).  Pow-2 bucketing bounds padding waste
    below 2x at the cost of at most log2(batch_size)+1 compiled shapes —
    the BatchedFreeFine jit keys already include the batch length."""
    b = 1
    while b < n:
        b *= 2
    return min(b, batch_size)


def run_geobench_bggen(
    pipe,
    annotations_json: str,
    dst_base: str,
    blending: bool = True,
    bench: str = "2d",
    num_step: int = 50,
    start_step: int = 1,
    guidance_scale: float = 7.5,
    eta: float = 1.0,
    end_step: int = 35,
    end_scale: float = 0.5,
    dilation: int = 30,
    seed: int = 42,
    batch_size: int = 1,
    shared_source: bool = False,
    max_cases: Optional[int] = None,
    progress: Callable[[str], None] = print,
) -> Optional[Dict]:
    """Background-generation pass producing `inp_img_blended/` (or
    `inp_img_no_blend/`) consumed by the 2D/3D edit runs via `inp_img_dir`
    (reference freefine_batch_infer_bggen_2d.py:96-205).

    One background per (da_n, ins_id) instance: dilate the object mask by
    30, regenerate an "empty scene" (guidance 7.5, start_step 1, end_step
    35), optionally Gaussian-blend the result over the original.  Resume is
    by inp_img.png existence; with batch_size > 1, instances run through
    `BatchedFreeFine.background_generation` (beyond the reference's hard
    batch-1 limit).  With `shared_source` additionally group instances by
    da_n (GeoBench instances of one da_n are objects in the SAME image) and
    run each group through `background_generation_shared_source` — one
    source inversion + one reference pass per step for the whole group.
    """
    from freefine_tpu import native

    pidx, pcount = maybe_initialize_distributed()
    sub = "inp_img_blended" if blending else "inp_img_no_blend"
    inp_dir = osp.join(dst_base, f"Geo-Bench-{bench.upper()}", sub)
    data = json.load(open(annotations_json))
    base_dir = osp.dirname(annotations_json)

    def resolve(p):
        return p if osp.isabs(p) else osp.join(base_dir, p)

    # one background per instance (the first case supplies the paths)
    instances, done = [], []
    for da_n, da in data.items():
        for ins_id, cases in da.get("instances", {}).items():
            if not cases:
                continue
            first = next(iter(cases.values()))
            out_path = osp.join(inp_dir, str(da_n), str(ins_id), "inp_img.png")
            item = {
                "da_n": str(da_n), "ins_id": str(ins_id),
                "ori_img_path": first["ori_img_path"],
                "ori_mask_path": first["ori_mask_path"],
                "inp_img_path": out_path,
            }
            (done if osp.exists(out_path) else instances).append(item)

    my = instances[pidx::pcount]
    if max_cases is not None:
        my = my[:max_cases]
    progress(f"[proc {pidx}/{pcount}] bggen: {len(my)} instances "
             f"({len(done)} already done)")

    size = pipe.config.height  # blend at the pipeline resolution

    def load(item):
        # purely host-side (native C++ dilate, cv2-anchor-exact — same
        # binarize∘dilate∘binarize as masks.dilate) so the prefetch thread
        # never touches the device the edit scan owns
        ori = read_image(resolve(item["ori_img_path"]), size=size)
        m = read_mask(resolve(item["ori_mask_path"]), size=size)
        dil = (native.dilate(m, dilation) > 0).astype(np.float32)
        return ori, dil

    results: List[Dict] = []
    t0 = time.time()
    if batch_size > 1:
        from freefine_tpu.pipeline import BatchedFreeFine

        batched = BatchedFreeFine(pipe)
        if shared_source:
            # Instances of one da_n share the source image; bucket by the
            # actual source path (strict), then chunk to the batch size.
            by_img: Dict = {}
            for it in my:
                by_img.setdefault(it["ori_img_path"], []).append(it)
            raw_groups = [
                g[b0 : b0 + batch_size]
                for g in by_img.values()
                for b0 in range(0, len(g), batch_size)
            ]
        else:
            raw_groups = [my[b0: b0 + batch_size]
                          for b0 in range(0, len(my), batch_size)]
        # pad each group to its pow-2 bucket (shared groups are per-source
        # and often small; see _bucket_size)
        groups = [
            g + [g[-1]] * (_bucket_size(len(g), batch_size) - len(g))
            for g in raw_groups
        ]
        gen = (batched.background_generation_shared_source
               if shared_source else batched.background_generation)
        for raw, group, loaded in zip(
            raw_groups, groups,
            _prefetch(groups, lambda g: [load(it) for it in g]),
        ):
            outs = gen(
                [dict(ori_img=o, ori_mask=d, guidance_text="empty scene")
                 for o, d in loaded],
                guidance_scale=guidance_scale, eta=eta, end_step=end_step,
                num_step=num_step, start_step=start_step,
                end_scale=end_scale,
                # per-case seeds: each instance's background is bit-identical
                # to the batch-1 lane's, independent of group composition
                # (tail padding repeats the last instance's seed too)
                seed=[_instance_seed(seed, it["da_n"], it["ins_id"])
                      for it in group],
            )
            for it, (ori, dil), out in zip(raw, loaded, outs):
                final = blend_background(ori, out, dil) if blending else out
                save_image(final, it["inp_img_path"])
                results.append(dict(it))
    else:
        for i, (it, (ori, dil)) in enumerate(
            zip(my, _prefetch(my, load))
        ):
            out = pipe.background_generation(
                ori, dil, "empty scene",
                guidance_scale=guidance_scale, eta=eta, end_step=end_step,
                num_step=num_step, start_step=start_step,
                end_scale=end_scale,
                seed=_instance_seed(seed, it["da_n"], it["ins_id"]),
            )
            final = blend_background(ori, out, dil) if blending else out
            save_image(final, it["inp_img_path"])
            results.append(dict(it))
            if (i + 1) % 10 == 0:
                rate = (i + 1) / (time.time() - t0) * 60
                progress(f"[proc {pidx}] {i+1}/{len(my)} ({rate:.1f} bg/min)")

    gathered = _allgather_results(results)
    if pidx != 0:
        return None
    merged: Dict = {}
    for item in done + [r for lst in gathered for r in lst]:
        merged.setdefault(item["da_n"], {}).setdefault(
            "instances", {}
        )[item["ins_id"]] = item
    out_path = osp.join(dst_base, f"bggen_results_{bench}.json")
    save_json(merged, out_path)
    progress(f"[proc 0] wrote {out_path}; backgrounds in {inp_dir}")
    return merged


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
    bench: str = "2d",
    batch_size: int = 1,
    shared_source: bool = False,
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

    `batch_size > 1` groups cases through `BatchedFreeFine` (ONE vmapped
    device step per group, identical protocol args; the reference harness
    is locked to batch 1) — measured ~1.1x eval throughput at batch 2
    (BATCH_SCALING.md).

    Returns the merged results dict on process 0 (None elsewhere).
    """
    if task == "author3d":
        from freefine_tpu.data.author3d import run_geobench_author3d

        return run_geobench_author3d(
            annotations_json, dst_base, max_cases=max_cases,
            progress=progress,
        )
    if shared_source and batch_size <= 1:
        raise ValueError(
            "shared_source groups same-source cases into a batched device "
            "step; pass batch_size > 1"
        )
    if task == "bggen":
        return run_geobench_bggen(
            pipe, annotations_json, dst_base, bench=bench,
            num_step=num_step, start_step=start_step or 1,
            guidance_scale=guidance_scale, eta=eta, seed=seed,
            batch_size=batch_size, shared_source=shared_source,
            max_cases=max_cases, progress=progress,
        )
    if start_step is None:
        # protocol defaults at 50 steps (35 for 2D, 15 for 3D), scaled
        # proportionally for short smoke runs
        start_step = round(num_step * (15 if task == "3d" else 35) / 50)
        start_step = max(1, min(start_step, num_step - 1))
    assert 0 < start_step < num_step, (start_step, num_step)
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

    def load_case(case) -> Dict:
        """Load one case's inputs as a BatchedFreeFine-style dict following
        the exact task protocol (shared by the batch-1 and batched paths)."""
        da_n, ins_id, edit_ins = case["da_n"], case["ins_id"], case["edit_ins"]
        ori_img = read_image(ds.resolve(case["ori_img_path"]))
        ori_mask = read_mask(ds.resolve(case["ori_mask_path"]))
        if task == "3d":
            coarse = read_image(
                ds.resolve(
                    case.get(
                        "coarse_input_path_0",
                        osp.join(dst_base, "Geo-Bench-3D",
                                 "coarse3d_depth_anything",
                                 da_n, ins_id, f"{edit_ins}.png"),
                    )
                )
            )
            target_mask = read_mask(
                ds.resolve(
                    case.get(
                        "target_mask_0",
                        osp.join(dst_base, "Geo-Bench-3D", "mesh_mask",
                                 da_n, ins_id, f"{edit_ins}.png"),
                    )
                )
            )
            draw_mask = read_mask(
                ds.resolve(
                    case.get(
                        "draw_mask",
                        osp.join(dst_base, "Geo-Bench-3D", "md_mask",
                                 da_n, ins_id, f"{edit_ins}.png"),
                    )
                )
            )
            return dict(
                ori_img=ori_img, ori_mask=ori_mask, coarse_input=coarse,
                target_mask=target_mask, draw_mask=draw_mask,
                cons_area=target_mask,
                guidance_text=case.get("obj_label", ""),
            )
        if inp_img_dir is not None:
            inp_bg = read_image(
                osp.join(inp_img_dir, da_n, ins_id, "inp_img.png")
            )
        else:
            inp_bg = ori_img
        coarse, target_mask, _ = re_edit_2d(
            ori_img, ori_mask, case["edit_param"], inp_bg
        )
        return dict(
            ori_img=ori_img, ori_mask=ori_mask, coarse_input=coarse,
            target_mask=target_mask, cons_area=target_mask,
            guidance_text="",
        )

    results: List[Dict] = []
    t0 = time.time()

    if batch_size > 1:
        # Case-batched eval (beyond the reference's hard batch-1 limit,
        # freefine_batch_infer_2d.py:170): groups run through ONE vmapped
        # device step via BatchedFreeFine; short tail groups are padded to
        # the compiled batch size.  Protocol args identical to the batch-1
        # path below.
        from freefine_tpu.pipeline import BatchedFreeFine

        batched = BatchedFreeFine(pipe)
        done = 0
        if shared_source:
            # Group edits of the SAME source instance (GeoBench keys each
            # case by da_n/ins_id, ~10 edits per instance) so the shared-
            # reference lane inverts and runs the reference stream once per
            # group (pipeline.generation_shared_source).
            by_src: Dict = {}
            for c in my_cases:
                by_src.setdefault((c["da_n"], c["ins_id"]), []).append(c)
            groups = [
                g[b0 : b0 + batch_size]
                for g in by_src.values()
                for b0 in range(0, len(g), batch_size)
            ]
        else:
            groups = [
                my_cases[b0 : b0 + batch_size]
                for b0 in range(0, len(my_cases), batch_size)
            ]
        for group, loaded in zip(
            groups, _prefetch(groups, lambda g: [load_case(c) for c in g])
        ):
            group_t0 = time.time()
            pad_to = (
                _bucket_size(len(loaded), batch_size)
                if shared_source else batch_size
            )
            padded = loaded + [loaded[-1]] * (pad_to - len(loaded))
            gen_kwargs = dict(
                guidance_scale=guidance_scale, eta=eta,
                num_step=num_step, start_step=start_step,
                end_step=num_step, end_scale=0.0, method_type="tca",
                use_auto_draw=(task != "3d"), reduce_inp_artifacts=True,
                # every case gets key(seed) — the exact RNG the batch-1
                # protocol lane uses (reference fixes seed=42 per case)
                seed=[seed] * len(padded),
            )
            outs = (
                batched.generation_shared_source(padded, **gen_kwargs)
                if shared_source else
                batched.generation(padded, **gen_kwargs)
            )
            per_case = (time.time() - group_t0) / len(group)
            for case, out in zip(group, outs):
                path = ds.output_path(
                    case["da_n"], case["ins_id"], case["edit_ins"]
                )
                save_image(out, path)
                results.append({
                    **case, "gen_img_path": path,
                    "edit_seconds": round(per_case, 3),
                })
            done += len(group)
            rate = done / (time.time() - t0) * 60
            progress(
                f"[proc {pidx}] {done}/{len(my_cases)} ({rate:.1f} edits/min)"
            )
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

    for i, (case, loaded) in enumerate(
        zip(my_cases, _prefetch(my_cases, load_case))
    ):
        case_t0 = time.time()
        da_n, ins_id, edit_ins = case["da_n"], case["ins_id"], case["edit_ins"]
        # exact task protocols, shared with the batched path via load_case —
        # 2D (freefine_batch_infer_2d.py:195-230): guidance_text = "",
        # auto-draw on; 3D (freefine_batch_infer_3d_depth.py:144-162):
        # guidance_text = obj_label, user draw mask, auto-draw off.  Both:
        # end_step 50 / end_scale 0.0 (TCA active to the end),
        # cons_area = target_mask, reduce_inp_artifacts on.
        out = pipe.generation(
            loaded["ori_img"], loaded["ori_mask"], loaded["coarse_input"],
            loaded["target_mask"], loaded["guidance_text"],
            guidance_scale=guidance_scale, eta=eta,
            num_step=num_step, start_step=start_step,
            end_step=num_step, end_scale=0.0, method_type="tca",
            draw_mask=loaded.get("draw_mask"),
            use_auto_draw=(task != "3d"),
            cons_area=loaded["cons_area"],
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
