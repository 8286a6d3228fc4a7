"""Structure completion — parity with jupyter_demo/sc_vis.ipynb.

Reference flow: the user supplies a draw_mask marking the region to
synthesise; FreeFine_generation runs with use_auto_draw=False so the
completion region comes from the draw mask (coarse input = source image,
target mask = the structure's mask).

Usage: python examples/structure_completion.py --tiny
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
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image", default=None)
    ap.add_argument("--mask", default=None, help="object/structure mask")
    ap.add_argument("--draw-mask", default=None, help="region to complete")
    ap.add_argument("--prompt", default="a complete object")
    ap.add_argument("--out", default="completion_out.png")
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
        mask = np.asarray(Image.open(args.mask).convert("L").resize((w, h), 0))
        draw = np.asarray(Image.open(args.draw_mask).convert("L").resize((w, h), 0))
    else:
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4 : h // 2, w // 4 : w // 2] = 255
        draw = np.zeros((h, w), np.uint8)
        draw[h // 2 : 3 * h // 4, w // 4 : w // 2] = 255  # extend downward

    num_step = 8 if args.tiny else 50
    start_step = 4 if args.tiny else 25
    t0 = time.time()
    out = pipe.generation(
        img, mask, img, mask, args.prompt,
        guidance_scale=7.5, eta=1.0,
        num_step=num_step, start_step=start_step,
        end_step=max(1, num_step // 5),
        draw_mask=draw, use_auto_draw=False,
    )
    print(f"structure completion: {time.time()-t0:.2f}s -> {out.shape}")

    from PIL import Image

    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
