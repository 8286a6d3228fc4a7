"""Throughput benchmark: edits/min/chip at 512^2, 50-step DDIM.

Reproduces the reference's 2D GeoBench inference envelope
(evaluation/FreeFine/freefine_batch_infer_2d.py:212-230): SD-1.5, 512^2,
num_step=50, start_step=35 (15 inversion UNet passes on a 2-stream batch +
15 regeneration passes on the deduped 3-stream batch [u_e, r, c_e] — the
reference runs 4 streams but its c_r duplicates u_r, see
pipeline.sample_edit_loop), guidance 7.5, eta 1.0, TCA.
Weights are randomly initialised — identical FLOPs/memory to the real
checkpoint, no quality claim.

Prints ONE JSON line:
  {"metric": "edits/min/chip @512^2 50-step", "value": ..., "unit":
   "edits/min", "vs_baseline": value / 20.0}
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50, help="num DDIM steps")
    ap.add_argument("--start-step", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3, help="timed edits")
    ap.add_argument("--tiny", action="store_true", help="tiny config smoke run")
    ap.add_argument("--batch", type=int, default=1,
                    help="cases per device step (BatchedFreeFine)")
    ap.add_argument("--profile", action="store_true",
                    help="per-stage timing via StageTimer (batched path; "
                         "prints the breakdown to stderr)")
    args = ap.parse_args()

    import jax

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine

    cfg = tiny_pipeline_config() if args.tiny else sd15_pipeline_config()
    pipe = FreeFine(config=cfg, init_random=True)

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

        def one_edit(seed):
            return batched.generation(
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

    result = {
        "metric": "edits/min/chip @512^2 50-step" if not args.tiny else "edits/min (tiny smoke)",
        "value": round(epm, 3),
        "unit": "edits/min",
        "vs_baseline": round(epm / 20.0, 3),
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
