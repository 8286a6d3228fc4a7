"""Baseline-core demo: drag-edit one image with a chosen method.

The reference evaluates each baseline through its own eval_geobench.py
(e.g. evaluation/RegionDrag/eval_geobench.py); this script is the
single-image interactive counterpart over the TPU-native cores.

Usage: python examples/baseline_drag.py --tiny --baseline region_drag
       python examples/baseline_drag.py --checkpoint /path/sd15 \
           --image img.png --src-mask src.png --tgt-mask tgt.png \
           --baseline drag_diffusion --prompt "a photo of a cat"
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401  (JAX_PLATFORMS override)
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--baseline", default="region_drag",
                    choices=["region_drag", "self_guidance", "drag_diffusion",
                             "design_edit", "geo_diffuser",
                             "motion_guidance", "diffusion_handles"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image", default=None)
    ap.add_argument("--src-mask", default=None)
    ap.add_argument("--tgt-mask", default=None)
    ap.add_argument("--prompt", default="a photo of an object")
    ap.add_argument("--obj", default="object",
                    help="self_guidance: the edited object word")
    ap.add_argument("--out", default="baseline_out.png")
    args = ap.parse_args()

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine

    cfg = tiny_pipeline_config() if args.tiny else sd15_pipeline_config()
    pipe = FreeFine(
        config=cfg, init_random=args.checkpoint is None,
        tokenizer_path=args.checkpoint and f"{args.checkpoint}/tokenizer",
    )
    if args.checkpoint:
        from freefine_tpu.weights import load_sd15

        pipe.params = load_sd15(pipe, args.checkpoint)

    h, w = cfg.height, cfg.width
    if args.image:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB").resize((w, h)))
        src = np.asarray(Image.open(args.src_mask).convert("L").resize((w, h), 0))
        tgt = np.asarray(Image.open(args.tgt_mask).convert("L").resize((w, h), 0))
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        src = np.zeros((h, w), np.uint8)
        tgt = np.zeros((h, w), np.uint8)
        src[h // 4 : h // 2, w // 4 : w // 2] = 255
        tgt[h // 2 : 3 * h // 4, w // 2 : 3 * w // 4] = 255

    steps = 8 if args.tiny else 50
    t0 = time.time()
    if args.baseline == "region_drag":
        from freefine_tpu.baselines import RegionDrag

        out = RegionDrag(pipe).drag_regions(
            img, src, tgt, args.prompt, steps=steps,
        )
    elif args.baseline == "self_guidance":
        from freefine_tpu.baselines import SelfGuidance

        # derive the transform from mask centroids (translation demo)
        cs = np.argwhere(src > 0).mean(0)
        ct = np.argwhere(tgt > 0).mean(0)
        edit_param = [float((ct[1] - cs[1]) / w), float((ct[0] - cs[0]) / h),
                      0, 0, 0, 0.0, 1.0, 1.0, 1]
        out = SelfGuidance(pipe).edit(
            img, args.prompt, args.obj, edit_param, steps=steps,
        )
    elif args.baseline == "drag_diffusion":
        from freefine_tpu.baselines import DragDiffusion

        cs = np.argwhere(src > 0).mean(0)[::-1]
        ct = np.argwhere(tgt > 0).mean(0)[::-1]
        out = DragDiffusion(pipe).drag(
            img, cs[None], ct[None], args.prompt,
            mask=((src > 0) | (tgt > 0)).astype(np.float32),
            n_pix_step=10 if args.tiny else 80,
            train_lora_steps=4 if args.tiny else 80,
            lora_rank=2 if args.tiny else 16,
        )
    elif args.baseline == "design_edit":
        from freefine_tpu.baselines import DesignEdit

        cs = np.argwhere(src > 0).mean(0)
        ct = np.argwhere(tgt > 0).mean(0)
        out = DesignEdit(pipe).move(
            img, src, dx=float(ct[1] - cs[1]) / w, dy=float(cs[0] - ct[0]) / h,
            prompt=args.prompt, steps=steps,
        )
    elif args.baseline == "geo_diffuser":
        from freefine_tpu.baselines import GeoDiffuser

        cs = np.argwhere(src > 0).mean(0)
        ct = np.argwhere(tgt > 0).mean(0)
        param = [float(ct[1] - cs[1]), float(ct[0] - cs[0]),
                 0, 0, 0, 0, 1, 1, 1]
        out = GeoDiffuser(pipe).edit(img, src, param, steps=steps)
    elif args.baseline == "motion_guidance":
        import jax
        import jax.numpy as jnp

        from freefine_tpu.baselines import MotionGuidance
        from freefine_tpu.models.raft import RAFT, RAFTConfig

        raft = RAFT(config=RAFTConfig(iters=2 if args.tiny else 5))
        x0 = jnp.zeros((1, h, w, 3))
        raft_params = raft.init(jax.random.key(0), x0, x0)
        cs = np.argwhere(src > 0).mean(0)
        ct = np.argwhere(tgt > 0).mean(0)
        param = [float(ct[1] - cs[1]), float(ct[0] - cs[0]),
                 0, 0, 0, 0, 1, 1, 1]
        out = MotionGuidance(pipe, raft, raft_params).edit(
            img, param, src, args.prompt, steps=min(steps, 8),
            num_recursive=2 if args.tiny else 10,
        )
    else:
        from freefine_tpu.baselines import DiffusionHandles

        depth = np.full((h, w), 4.0, np.float32)
        cs = np.argwhere(src > 0).mean(0)
        ct = np.argwhere(tgt > 0).mean(0)
        param = [float(ct[1] - cs[1]), float(ct[0] - cs[0]),
                 0, 0, 0, 0, 1, 1, 1]
        out = DiffusionHandles(pipe).edit(
            img, depth, src, param, prompt=args.prompt, steps=min(steps, 8),
            num_optsteps=1 if args.tiny else 3,
            nti_iters=2 if args.tiny else 10,
        )
    print(f"{args.baseline}: {time.time()-t0:.2f}s -> {out.shape}")

    from PIL import Image

    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
