"""End-to-end 2D geometric edit demo.

Mirrors the reference's canonical workflow (jupyter_demo/Partial-editing.ipynb
and evaluation/FreeFine/freefine_batch_infer_2d.py:177-237): coarse 2D affine
edit -> DDIM inversion -> TCA regeneration -> decoded uint8 image.

With --tiny it runs the structural pipeline on random weights (any device,
seconds); with --checkpoint it runs real SD-1.5.

Usage:
  python examples/edit_2d.py --tiny
  python examples/edit_2d.py --checkpoint /path/to/sd15 \
      --image img.png --mask mask.png --prompt "a red car"
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401  (JAX_PLATFORMS override)
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config, random weights")
    ap.add_argument("--checkpoint", type=str, default=None, help="diffusers SD-1.5 dir")
    ap.add_argument("--image", type=str, default=None)
    ap.add_argument("--mask", type=str, default=None)
    ap.add_argument("--prompt", type=str, default="a photo")
    ap.add_argument("--dx", type=float, default=40)
    ap.add_argument("--dy", type=float, default=0)
    ap.add_argument("--rotate", type=float, default=0)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--num-step", type=int, default=None)
    ap.add_argument("--start-step", type=int, default=None)
    ap.add_argument("--out", type=str, default="edit_out.png")
    args = ap.parse_args()

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.ops.geometry import re_edit_2d
    from freefine_tpu.pipeline import FreeFine

    if args.tiny:
        cfg = tiny_pipeline_config()
        pipe = FreeFine(config=cfg, init_random=True)
        num_step = args.num_step or 8
        start_step = args.start_step or 4
    else:
        cfg = sd15_pipeline_config()
        pipe = FreeFine(config=cfg, init_random=args.checkpoint is None,
                        tokenizer_path=(args.checkpoint or None) and f"{args.checkpoint}/tokenizer")
        if args.checkpoint:
            from freefine_tpu.weights import load_sd15
            pipe.params = load_sd15(pipe, args.checkpoint)
        num_step = args.num_step or 50
        start_step = args.start_step or 35

    h, w = cfg.height, cfg.width
    if args.image:
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert("RGB").resize((w, h)))
        mask = np.asarray(Image.open(args.mask).convert("L").resize((w, h), 0))
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4 : h // 2, w // 4 : w // 2] = 255

    t0 = time.time()
    coarse, target_mask, _ = re_edit_2d(
        img, mask, dx=args.dx, dy=args.dy, rotation=args.rotate,
        scale_x=args.scale, scale_y=args.scale,
    )
    coarse, target_mask = np.asarray(coarse), np.asarray(target_mask)
    print(f"coarse edit: {time.time()-t0:.2f}s")

    t0 = time.time()
    out = pipe.generation(
        img, mask, coarse, target_mask, args.prompt,
        guidance_scale=7.5, eta=1.0,
        num_step=num_step, start_step=start_step, end_step=max(1, num_step // 5),
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
        reduce_inp_artifacts=True,
    )
    print(f"invert + regenerate ({num_step - start_step} steps x2): {time.time()-t0:.2f}s")

    from PIL import Image
    Image.fromarray(out).save(args.out)
    print(f"saved {args.out} shape={out.shape}")


if __name__ == "__main__":
    main()
