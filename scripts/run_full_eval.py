"""One-command GeoBench evaluation — the whole reference pipeline
(evaluation/README.md:66-94: bggen -> input authoring -> 2D/3D inference
-> metrics) chained on this framework alone.

    python scripts/run_full_eval.py --dst-base /data/GeoBenchMeta \
        [--checkpoint /path/sd15] [--stages bggen2d,2d,bggen3d,author3d,3d] \
        [--metrics 000001100] [--max-cases N] [--tiny]

Stages (comma list, default all):
  bggen2d   backgrounds for the 2D bench (inp_img_blended/)
  2d        FreeFine 2D inference over annotations_2d.json
  bggen3d   backgrounds for the 3D bench
  author3d  depth-warped coarse inputs + mesh/md masks + correspondence
  3d        FreeFine 3D inference (consumes the authored annotations)
  metrics   metrics CLI over each produced results JSON (needs metric
            encoder weights via --metrics-weights for the model-based
            bits)

Every stage resumes by output existence, so re-running after an
interruption continues where it stopped.
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ALL_STAGES = ("bggen2d", "2d", "bggen3d", "author3d", "3d", "metrics")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dst-base", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="diffusers SD-1.5 dir (random weights if omitted)")
    ap.add_argument("--stages", default=",".join(ALL_STAGES))
    ap.add_argument("--num-step", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-cases", type=int, default=None)
    ap.add_argument("--depth-params", default=None,
                    help="author3d: Depth-Anything msgpack params")
    ap.add_argument("--metrics", default="000001100",
                    help="9-bit metric task string (see metrics.main)")
    ap.add_argument("--metrics-weights", default=None,
                    help="converted metric-encoder weights dir")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(stages) - set(ALL_STAGES)
    assert not unknown, f"unknown stages {unknown}"

    from freefine_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_inference
    from freefine_tpu.pipeline import FreeFine

    pipe = None

    def get_pipe():
        nonlocal pipe
        if pipe is None:
            cfg = tiny_pipeline_config() if args.tiny else sd15_pipeline_config()
            pipe = FreeFine(
                config=cfg, init_random=args.checkpoint is None,
                tokenizer_path=args.checkpoint and
                f"{args.checkpoint}/tokenizer",
            )
            if args.checkpoint:
                from freefine_tpu.weights import load_sd15

                pipe.params = load_sd15(pipe, args.checkpoint)
        return pipe

    ann2d = osp.join(args.dst_base, "annotations_2d.json")
    ann3d = osp.join(args.dst_base, "annotations_3d.json")
    ann3d_authored = osp.join(args.dst_base, "annotations_3d_authored.json")

    if "bggen2d" in stages and osp.exists(ann2d):
        print("== stage bggen2d ==")
        run_geobench_inference(
            get_pipe(), ann2d, args.dst_base, task="bggen", bench="2d",
            num_step=args.num_step, seed=args.seed,
            max_cases=args.max_cases,
        )
    if "2d" in stages and osp.exists(ann2d):
        print("== stage 2d ==")
        inp = osp.join(args.dst_base, "Geo-Bench-2D", "inp_img_blended")
        run_geobench_inference(
            get_pipe(), ann2d, args.dst_base, task="2d",
            num_step=args.num_step, seed=args.seed,
            inp_img_dir=inp if osp.isdir(inp) else None,
            max_cases=args.max_cases,
        )
    if "bggen3d" in stages and osp.exists(ann3d):
        print("== stage bggen3d ==")
        run_geobench_inference(
            get_pipe(), ann3d, args.dst_base, task="bggen", bench="3d",
            num_step=args.num_step, seed=args.seed,
            max_cases=args.max_cases,
        )
    if "author3d" in stages and osp.exists(ann3d):
        print("== stage author3d ==")
        from freefine_tpu.data.author3d import (
            make_depth_fn,
            run_geobench_author3d,
        )

        size = get_pipe().config.height
        run_geobench_author3d(
            ann3d, args.dst_base,
            depth_fn=make_depth_fn(
                "depth_anything", args.depth_params
            ) if not args.tiny else
            (lambda img: __import__("numpy").full(
                img.shape[:2], 0.5, "float32")),
            size=size, focal_length=550.0 * size / 512.0,
            max_cases=args.max_cases,
        )
    if "3d" in stages and (osp.exists(ann3d_authored) or osp.exists(ann3d)):
        print("== stage 3d ==")
        ann = ann3d_authored if osp.exists(ann3d_authored) else ann3d
        run_geobench_inference(
            get_pipe(), ann, args.dst_base, task="3d",
            num_step=args.num_step, seed=args.seed,
            max_cases=args.max_cases,
        )
    if "metrics" in stages:
        print("== stage metrics ==")
        from freefine_tpu.metrics.main import main as metrics_main

        for name, flag3d in (
            ("generated_results_freefine_2d.json", False),
            ("generated_results_freefine_3d.json", True),
        ):
            path = osp.join(args.dst_base, name)
            if not osp.exists(path):
                continue
            argv_m = ["--path", path, "--task", args.metrics]
            if flag3d:
                argv_m.append("--3d")
            if args.metrics_weights:
                argv_m += ["--weights-dir", args.metrics_weights]
            if args.tiny:
                argv_m += ["--sd-params", "random", "--sd-config", "tiny"]
            print(f"metrics over {name}: {metrics_main(argv_m)}")
    print("full eval done")


if __name__ == "__main__":
    main()
