"""Paired chip measurement of the case-batched baseline lanes
(SelfGuidance.edit_batch / DesignEdit.move_batch) vs their batch-1 cores
— the BATCH_SCALING.md evidence VERDICT r3 #7 asks for.

Times warm steady-state edits at the GeoBench protocol scale (512²,
50-step unless overridden), random weights in the serving bf16 layout.

Usage:
    python scripts/bench_baseline_batch.py --baseline self_guidance \
        [--steps 50] [--size 512] [--batches 1 2 4] [--repeats 2]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", choices=["self_guidance", "design_edit"],
                    default="self_guidance")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine
    from freefine_tpu.weights import cast_params_for_inference

    cfg = (
        tiny_pipeline_config()
        if args.tiny
        else sd15_pipeline_config(height=args.size, width=args.size)
    )
    pipe = FreeFine(config=cfg, init_random=True, seed=0)
    pipe.params = cast_params_for_inference(pipe.params)

    h = cfg.height
    rng = np.random.default_rng(0)

    def case(i):
        img = rng.integers(0, 255, (h, h, 3), dtype=np.uint8)
        mask = np.zeros((h, h), np.uint8)
        mask[h // 4: h // 2, h // 4: h // 2] = 255
        # GeoBench-style per-case transforms (distinct so the traced-value
        # batching is honest, not a broadcast)
        params = [
            [40.0 + i, -20.0, 0, 0, 0, 10.0 + 5 * i, 1.1, 1.1, 1.0],
            [-25.0, 30.0 + i, 0, 0, 0, -15.0, 0.9, 1.0, 1.0],
            [15.0, 10.0, 0, 0, 0, 25.0, 1.0, 1.2, 1.0],
            [-10.0 - i, -35.0, 0, 0, 0, 5.0, 1.05, 0.95, 1.0],
        ][i % 4]
        return img, mask, params

    if args.baseline == "self_guidance":
        from freefine_tpu.baselines.self_guidance import SelfGuidance

        runner = SelfGuidance(pipe)

        def run(bs, seed0):
            imgs, prompts, objs, eps = [], [], [], []
            for i in range(bs):
                img, _, ep = case(i)
                imgs.append(img)
                prompts.append("image of a dog")
                objs.append("dog")
                eps.append(ep)
            if bs == 1:
                return runner.edit(imgs[0], prompts[0], objs[0], eps[0],
                                   steps=args.steps, seed=seed0)
            return runner.edit_batch(imgs, prompts, objs, eps,
                                     steps=args.steps,
                                     seed=list(range(seed0, seed0 + bs)))
    else:
        from freefine_tpu.baselines.design_edit import DesignEdit

        runner = DesignEdit(pipe)

        def run(bs, seed0):
            imgs, msks, moves = [], [], []
            for i in range(bs):
                img, mask, ep = case(i)
                imgs.append(img)
                msks.append(mask)
                moves.append((ep[0] / h, -ep[1] / h))
            if bs == 1:
                return runner.move(imgs[0], msks[0], dx=moves[0][0],
                                   dy=moves[0][1], prompt="image of a dog",
                                   steps=args.steps)
            return runner.move_batch(imgs, msks, moves,
                                     ["image of a dog"] * bs,
                                     steps=args.steps)

    for bs in args.batches:
        t0 = time.time()
        out = run(bs, 100)
        compile_s = time.time() - t0
        t0 = time.time()
        for r in range(args.repeats):
            out = run(bs, 200 + r)
        per_case = (time.time() - t0) / args.repeats / bs
        arr = np.asarray(out if bs == 1 else out[0], np.float64)
        assert np.isfinite(arr).all()
        print(
            f"{args.baseline} batch={bs}: compile+warm {compile_s:.1f}s, "
            f"steady {per_case:.2f} s/edit, {60.0 / per_case:.1f} edits/min",
            flush=True,
        )


if __name__ == "__main__":
    main()
