"""Throughput benchmark: edits/min/chip at 512^2, 50-step DDIM.

Reproduces the reference's 2D GeoBench inference envelope
(evaluation/FreeFine/freefine_batch_infer_2d.py:212-230): SD-1.5, 512^2,
num_step=50, start_step=35 (15 inversion UNet passes on a 2-stream batch +
15 regeneration passes on the deduped 3-stream batch [u_e, r, c_e] — the
reference runs 4 streams but its c_r duplicates u_r, see
pipeline.sample_edit_loop), guidance 7.5, eta 1.0, TCA.
Weights are randomly initialised — identical FLOPs/memory to the real
checkpoint, no quality claim.

The default (no flags) benches the measured-best protocol-exact serving
shape: the shared-source lane at batch 8 (GeoBench groups ~10 edits per
source; generation_shared_source inverts the source once and broadcasts
its per-step reference K/V — exactness vs per-case pinned in
tests/test_shared_ref.py; 73.0 edits/min chip-measured, BATCH_SCALING.md).
`--no-shared` or an explicit `--batch N` restores the per-case lane.

Prints ONE JSON line:
  {"metric": "edits/min/chip @512^2 50-step", "value": ..., "unit":
   "edits/min", "vs_baseline": value / 20.0, "lane": ...}
(baseline: the 20 edits/min/chip build target in /root/repo/BASELINE.json).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Honor an explicit JAX_PLATFORMS even when sitecustomize pins another
# backend (mirrors tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass



# Persistent XLA compilation cache: spares repeat runs the multi-minute
# SD-1.5 compile (safe no-op where unsupported).
from freefine_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def _random_params_fast(pipe, weights_dtype: str, seed: int = 0):
    """Random params in the serving dtype, generated ON the device.

    Avoids two traps of `model.init`: it executes a full init forward
    (minutes on this 1-core host for SDXL at 1024^2), and it materialises
    the f32 tree (~14 GB for SDXL — more than one 16 GB chip once the bf16
    copy exists).  One jit builds the whole tree from `jax.eval_shape`
    metadata: 'scale' leaves (norms) ones, other 1-D leaves zeros, kernels
    N(0, 0.02) cast to bf16 when weights_dtype == 'bf16' (matmul/conv
    kernels only — the same layout `weights.cast_params_for_inference`
    produces).  Peak device memory = one serving-dtype tree."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(pipe.init_params, jax.random.key(seed))
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    big = jnp.bfloat16 if weights_dtype == "bf16" else jnp.float32

    def build(key):
        out = []
        for i, (path, s) in enumerate(paths_leaves):
            name = getattr(path[-1], "key", str(path[-1]))
            if name == "scale":
                out.append(jnp.ones(s.shape, jnp.float32))
            elif len(s.shape) <= 1:
                out.append(jnp.zeros(s.shape, jnp.float32))
            else:
                k = jax.random.fold_in(key, i)
                out.append(
                    (jax.random.normal(k, s.shape, jnp.float32) * 0.02)
                    .astype(big)
                )
        return jax.tree_util.tree_unflatten(treedef, out)

    return jax.jit(build)(jax.random.key(seed))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50, help="num DDIM steps")
    ap.add_argument("--start-step", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3, help="timed edits")
    ap.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    ap.add_argument("--batch", type=int, default=None,
                    help="cases per device step (BatchedFreeFine). "
                         "Default: 16 on the flagship SD-1.5 @512^2 lane "
                         "(the measured-best serving shape), 1 elsewhere.")
    ap.add_argument("--profile", action="store_true",
                    help="per-stage timing via StageTimer (batched path; "
                         "prints the breakdown to stderr)")
    ap.add_argument("--shared", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="shared-reference batched lane "
                         "(generation_shared_source): cases share one "
                         "source image so the reference stream is "
                         "inverted and run once per step for the whole "
                         "batch — the GeoBench per-instance grouping "
                         "(~10 edits per source; exactness vs the "
                         "per-case lane pinned in tests/test_shared_ref). "
                         "Default: ON for the flagship batched lane "
                         "(chip-measured 76.9 edits/min at batch 16 vs "
                         "48.2 per-case at batch 8 — BATCH_SCALING.md); "
                         "--no-shared restores per-case batching. "
                         "Requires --batch > 1 to pay off.")
    ap.add_argument("--sdxl", action="store_true",
                    help="SDXL backbone at 1024^2 (the reference's named "
                         "scaling TODO, README:77); batch 1 only")
    ap.add_argument("--dit", action="store_true",
                    help="DiT backbone at 512^2 (the other half of the "
                         "reference's backbone-swap TODO): PixArt-XL "
                         "geometry, 1024 tokens, same editing semantics")
    ap.add_argument("--mesh", type=str, default=None,
                    help="serve on a (data x model) device mesh, e.g. "
                         "'data=4,model=2' (FreeFine.use_mesh: TP-sharded "
                         "params, case batch over 'data'; pair with "
                         "--batch >= data). Single-chip hosts: validated "
                         "by __graft_entry__.dryrun_multichip on a "
                         "virtual CPU mesh.")
    ap.add_argument("--sp", action="store_true",
                    help="with --mesh model>1: shard long self-attention "
                         "sequences over the model axis "
                         "(sequence-parallel allgather-KV; SDXL@1024^2 "
                         "S=4096 lanes)")
    ap.add_argument("--weights-dtype", choices=["f32", "bf16"],
                    default="bf16",
                    help="param storage dtype (default bf16 — the serving "
                         "layout: halves weight HBM traffic, measured "
                         "40.6 vs 39.5 edits/min, and the f32 SDXL stack "
                         "does not fit a 16 GB chip; f32 is the golden-"
                         "comparison layout)")
    args = ap.parse_args()

    # Lane defaults: the flagship SD-1.5 @512^2 lane benches the
    # measured-best protocol-exact serving shape (shared-source batch 16,
    # 76.9 edits/min chip-measured — BATCH_SCALING.md); every opt-in lane
    # (--tiny/--sdxl/--dit/--mesh/--profile) keeps batch-1 per-case
    # semantics unless asked otherwise.
    flagship = not (args.tiny or args.sdxl or args.dit or args.mesh
                    or args.profile)
    batch_defaulted = args.batch is None
    if batch_defaulted:
        args.batch = 16 if (flagship and args.shared is not False) else 1
        if args.shared and args.batch == 1:
            args.batch = 8  # an explicit --shared on an opt-in lane
    if args.shared is None:
        # An explicit --batch N means the documented per-case lane; only
        # the all-default flagship invocation (and explicit --shared)
        # runs shared-source.
        args.shared = flagship and batch_defaulted and args.batch > 1
    assert not (args.shared and args.batch == 1), (
        "--shared needs --batch > 1 (the shared-reference lane amortises "
        "one reference pass across a batch)"
    )

    import jax

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine

    weights_dtype = args.weights_dtype
    if args.sdxl and weights_dtype == "f32":
        ap.error("--sdxl requires bf16 weights on a 16 GB chip")

    # Construct with a params placeholder, then fill with device-generated
    # random weights directly in the serving dtype (see
    # _random_params_fast for why model.init cannot be used here).
    if args.sdxl:
        from freefine_tpu.config import (
            sdxl_pipeline_config, tiny_sdxl_pipeline_config,
        )
        from freefine_tpu.sdxl import SDXLFreeFine

        cfg = (tiny_sdxl_pipeline_config() if args.tiny
               else sdxl_pipeline_config())
        pipe = SDXLFreeFine(config=cfg, params={})
    elif args.dit:
        from freefine_tpu.config import (
            dit_pipeline_config, tiny_dit_pipeline_config,
        )

        cfg = (tiny_dit_pipeline_config() if args.tiny
               else dit_pipeline_config())
        pipe = FreeFine(config=cfg, params={})
    else:
        cfg = tiny_pipeline_config() if args.tiny else sd15_pipeline_config()
        pipe = FreeFine(config=cfg, params={})

    pipe.params = _random_params_fast(pipe, weights_dtype)
    if args.mesh:
        pipe.use_mesh(args.mesh, sequence_parallel=args.sp)

    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(42)
    ori = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    coarse = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    ori_mask = np.zeros((h, w), np.uint8)
    ori_mask[h // 4 : h // 2, w // 4 : w // 2] = 255
    tgt_mask = np.zeros((h, w), np.uint8)
    tgt_mask[h // 3 : h // 3 + h // 4, w // 3 : w // 3 + w // 4] = 255
    cons = np.zeros((h, w), np.uint8)

    num_step = args.steps
    start_step = (
        args.start_step
        if args.start_step is not None
        else max(1, int(round(num_step * 0.7)))  # 35/50, the 2D eval setting
    )

    timer = None
    if args.profile:
        from freefine_tpu.utils.profiling import StageTimer

        timer = StageTimer()

    if args.batch > 1 or args.profile:
        from freefine_tpu.pipeline import BatchedFreeFine

        batched = BatchedFreeFine(pipe)
        cases = [
            dict(ori_img=ori, ori_mask=ori_mask, coarse_input=coarse,
                 target_mask=tgt_mask, guidance_text="a photo of an object")
            for _ in range(args.batch)
        ]

        gen = (batched.generation_shared_source if args.shared
               else batched.generation)

        def one_edit(seed):
            return gen(
                cases, guidance_scale=7.5, eta=1.0,
                num_step=num_step, start_step=start_step,
                end_step=max(1, num_step // 5), seed=seed, timer=timer,
            )[0]
    else:
        def one_edit(seed):
            return pipe.generation(
                ori, ori_mask, coarse, tgt_mask, "a photo of an object",
                guidance_scale=7.5, eta=1.0,
                num_step=num_step, start_step=start_step,
                end_step=max(1, num_step // 5),
                use_auto_draw=True, cons_area=cons, reduce_inp_artifacts=True,
                seed=seed,
            )

    t0 = time.time()
    one_edit(0)  # compile + warm caches
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(args.repeats):
        out = one_edit(i + 1)
    wall = time.time() - t0
    per_edit = wall / args.repeats / args.batch
    epm = 60.0 / per_edit

    if args.tiny:
        metric = "edits/min (tiny smoke)"
    elif args.sdxl:
        metric = f"edits/min/chip SDXL @{cfg.height}^2 {num_step}-step"
    elif args.dit:
        metric = f"edits/min/chip DiT @{cfg.height}^2 {num_step}-step"
    else:
        metric = "edits/min/chip @512^2 50-step"
    lane = ("shared-source" if args.shared and args.batch > 1
            else "per-case") + f" batch {args.batch}"
    result = {
        "metric": metric,
        "value": round(epm, 3),
        "unit": "edits/min",
        "vs_baseline": round(epm / 20.0, 3),
        "lane": lane,
    }
    print(
        f"# device={jax.devices()[0].platform} compile={compile_s:.1f}s "
        f"per_edit={per_edit:.2f}s steps={num_step} start={start_step} "
        f"batch={args.batch} "
        f"out={out.shape}",
        file=sys.stderr,
    )
    if timer is not None:
        for stage, rec in timer.summary().items():
            # min_s is the steady-state cost (the first call holds the
            # compiles); total includes the warmup
            print(f"# stage {stage}: steady={rec['min_s']:.3f}s "
                  f"mean={rec['mean_s']:.3f}s total={rec['total_s']:.3f}s "
                  f"count={rec['count']}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
