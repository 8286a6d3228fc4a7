"""GeoBench batch inference CLI — parity with the reference's torchrun
launch (evaluation/FreeFine/run_script_2D.sh + freefine_batch_infer_2d.py).

Single host, one or more processes (multi-host via jax.distributed env):
  python examples/run_geobench.py --dst-base /data/GeoBenchMeta \
      --checkpoint /path/sd15 [--task 2d|3d] [--num-step 50]

Then score with:
  python -m freefine_tpu.metrics.main \
      --path <dst>/generated_results_freefine_2d.json --task 000011100
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401  (JAX_PLATFORMS override)
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst-base", required=True,
                    help="GeoBenchMeta dir with annotations_{2d,3d}.json")
    ap.add_argument("--checkpoint", default=None,
                    help="diffusers SD-1.5 dir (random weights if omitted)")
    ap.add_argument("--single-file", default=None,
                    help="single-file LDM checkpoint (v1-5-pruned.safetensors)")
    ap.add_argument("--task", default="2d",
                    choices=["2d", "3d", "bggen", "author3d"])
    ap.add_argument("--bench", default="2d", choices=["2d", "3d"],
                    help="which benchmark the bggen backgrounds are for")
    ap.add_argument("--num-step", type=int, default=50)
    ap.add_argument("--start-step", type=int, default=None)
    ap.add_argument("--guidance-scale", type=float, default=7.5)
    ap.add_argument("--eta", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-cases", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=1,
                    help="cases per device step (BatchedFreeFine; the "
                         "reference is locked to 1)")
    ap.add_argument("--inp-img-dir", default=None,
                    help="blended inpainted backgrounds (inp_img_blended/)")
    ap.add_argument("--weights-dtype", choices=["bf16", "f32"],
                    default="bf16",
                    help="param storage dtype after checkpoint load "
                         "(bf16 = the serving layout, halves weight HBM "
                         "traffic; f32 = the golden-comparison layout)")
    ap.add_argument("--shared", action="store_true",
                    help="shared-reference batched lane: group edits of "
                         "the same GeoBench source instance (da_n/ins_id) "
                         "and run the reference stream once per group "
                         "(generation_shared_source; intent reference-"
                         "stream semantics, see EditConfig.ref_vanilla). "
                         "With --task bggen, groups instances by source "
                         "image instead (+67%% measured, BATCH_SCALING.md)."
                         " Requires --batch-size > 1 to pay off.")
    ap.add_argument("--mesh", default=None,
                    help="serve on a (data x model) device mesh, e.g. "
                         "'data=4,model=2' (FreeFine.use_mesh): TP-sharded "
                         "params, batched cases over 'data'. Pair with "
                         "--batch-size >= data.")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.parallel.harness import run_geobench_inference
    from freefine_tpu.pipeline import FreeFine
    from freefine_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = tiny_pipeline_config() if args.tiny else sd15_pipeline_config()
    pipe = FreeFine(
        config=cfg,
        init_random=args.checkpoint is None and args.single_file is None,
        tokenizer_path=args.checkpoint and f"{args.checkpoint}/tokenizer",
    )
    if args.single_file:
        from freefine_tpu.weights import load_sd15_single_file

        pipe.params = load_sd15_single_file(pipe, args.single_file)
    elif args.checkpoint:
        from freefine_tpu.weights import load_sd15

        pipe.params = load_sd15(pipe, args.checkpoint)
    if args.weights_dtype == "bf16":
        from freefine_tpu.weights import cast_params_for_inference

        pipe.params = cast_params_for_inference(pipe.params)
    if args.mesh:
        pipe.use_mesh(args.mesh)

    if args.task == "bggen":
        ann = os.path.join(args.dst_base, f"annotations_{args.bench}.json")
    elif args.task in ("3d", "author3d"):
        # prefer the authored annotations (author3d fills the coarse/
        # mask/correspondence paths in)
        authored = os.path.join(args.dst_base, "annotations_3d_authored.json")
        plain = os.path.join(args.dst_base, "annotations_3d.json")
        ann = authored if (
            args.task == "3d" and os.path.exists(authored)
        ) else plain
    else:
        ann = os.path.join(args.dst_base, f"annotations_{args.task}.json")
    run_geobench_inference(
        pipe, ann, args.dst_base,
        task=args.task, num_step=args.num_step, start_step=args.start_step,
        guidance_scale=args.guidance_scale, eta=args.eta, seed=args.seed,
        inp_img_dir=args.inp_img_dir, max_cases=args.max_cases,
        bench=args.bench, batch_size=args.batch_size,
        shared_source=args.shared,
    )


if __name__ == "__main__":
    main()
