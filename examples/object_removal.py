"""Object removal workflow — parity with jupyter_demo/object_removal.ipynb.

Reference flow: dilate the object mask by 30, then
FreeFine_background_generation(ori_img, dil_mask, "an empty ... scene",
guidance_scale=3.5, eta=1.0, method_type='tca', start_step=1).

Usage: python examples/object_removal.py --tiny
       python examples/object_removal.py --checkpoint /path/sd15 \
           --image img.png --mask mask.png --prompt "an empty street"
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image", default=None)
    ap.add_argument("--mask", default=None)
    ap.add_argument("--prompt", default="an empty scene")
    ap.add_argument("--num-step", type=int, default=None)
    ap.add_argument("--out", default="removal_out.png")
    args = ap.parse_args()

    import jax.numpy as jnp

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.masks import dilate
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
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[h // 3 : h // 2, w // 3 : w // 2] = 255

    dil = np.asarray(dilate(jnp.asarray((mask > 0).astype(np.float32)), 30))
    num_step = args.num_step or (8 if args.tiny else 50)

    t0 = time.time()
    out = pipe.background_generation(
        img, (dil * 255).astype(np.uint8), args.prompt,
        guidance_scale=3.5, eta=1.0, method_type="tca",
        num_step=num_step, start_step=1, end_step=max(1, num_step // 5),
    )
    print(f"removal: {time.time()-t0:.2f}s -> {out.shape}")

    from PIL import Image

    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
