"""Appearance transfer — parity with jupyter_demo/Appearance_transfer.ipynb.

Reference flow: register_attention_control_compose ->
FreeFine_cross_image_composition([app_img, bg_img], [app_mask, bg_mask],
[ori_mask], ori_img, ["<label>"], appearance_transfer=True, start_step=15).

Usage: python examples/appearance_transfer.py --tiny
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
    ap.add_argument("--app-image", default=None, help="appearance source")
    ap.add_argument("--app-mask", default=None)
    ap.add_argument("--bg-image", default=None, help="structure/background")
    ap.add_argument("--bg-mask", default=None)
    ap.add_argument("--region-mask", default=None)
    ap.add_argument("--label", default="object")
    ap.add_argument("--out", default="transfer_out.png")
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
    if args.app_image:
        from PIL import Image

        def load(p, mode="RGB", resample=None):
            im = Image.open(p).convert(mode).resize((w, h), resample or 2)
            return np.asarray(im)

        app_img = load(args.app_image)
        app_mask = load(args.app_mask, "L", 0)
        bg_img = load(args.bg_image)
        bg_mask = load(args.bg_mask, "L", 0)
        region = load(args.region_mask, "L", 0)
    else:
        rng = np.random.default_rng(3)
        app_img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        bg_img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        app_mask = np.zeros((h, w), np.uint8); app_mask[: h // 2] = 255
        bg_mask = 255 - app_mask
        region = np.zeros((h, w), np.uint8)
        region[h // 4 : h // 2, w // 4 : w // 2] = 255

    num_step = 8 if args.tiny else 50
    start_step = 4 if args.tiny else 15
    t0 = time.time()
    out = pipe.cross_image_composition(
        [app_img, bg_img], [app_mask, bg_mask], [region], bg_img,
        [args.label], appearance_transfer=True,
        num_step=num_step, start_step=start_step,
        end_step=max(1, num_step // 5),
    )
    print(f"appearance transfer: {time.time()-t0:.2f}s -> {out.shape}")

    from PIL import Image

    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
