"""Partial (fine-grained) editing — parity with jupyter_demo/Partial-editing.ipynb.

Reference flow (the notebook, cells 1-4):
  1. dilate the FULL object mask by 20 (minus any protected areas) and run
     FreeFine_background_generation(ori, dil_full_mask, 'empty scene',
     guidance_scale=3.5, start_step=1) — a clean background plate;
  2. BrushNet-style blend: keep the original pixels everywhere EXCEPT inside
     the partial mask, where the generated background shows through;
  3. coarse-edit only the PART: re_edit_2d(ori, partial_mask, edit_param,
     blended_background);
  4. regenerate with FreeFine_generation(ori, partial_mask, coarse,
     target_mask, prompt, guidance_scale=4.0, end_scale=0.0, start_step=25,
     use_auto_draw=True, reduce_inp_artifacts=True,
     cons_area=full_mask - partial_mask)  — the rest of the object is a
     constrained area so the regeneration cannot repaint it.

Usage: python examples/partial_edit.py --tiny
       python examples/partial_edit.py --checkpoint /path/sd15 \
           --image ori.png --full-mask full.png --partial-mask part.png \
           --prompt crocodile --edit-param 0 0 15 0.8 0.8
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401  (JAX_PLATFORMS override)
import argparse
import time

import numpy as np

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "assets", "Partial-Editing", "cup")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image", default=None)
    ap.add_argument("--full-mask", default=None, help="whole-object mask")
    ap.add_argument("--partial-mask", default=None, help="part to edit")
    ap.add_argument("--prompt", default="a cup")
    ap.add_argument("--edit-param", type=float, nargs=5,
                    default=[0.0, 0.0, 15.0, 0.8, 0.8],
                    metavar=("DX", "DY", "RZ", "SX", "SY"))
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="partial_out.png")
    args = ap.parse_args()

    import jax.numpy as jnp

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.masks import dilate
    from freefine_tpu.ops.geometry import re_edit_2d
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
    from PIL import Image

    if args.image:
        paths = (args.image, args.full_mask, args.partial_mask)
    elif os.path.isdir(ASSETS) and not args.tiny:
        paths = (os.path.join(ASSETS, "ori.png"),
                 os.path.join(ASSETS, "full_mask.png"),
                 os.path.join(ASSETS, "partial_mask_0.png"))
    else:
        paths = None
    if paths:
        img = np.asarray(Image.open(paths[0]).convert("RGB").resize((w, h)))
        full = np.asarray(Image.open(paths[1]).convert("L").resize((w, h), 0))
        part = np.asarray(Image.open(paths[2]).convert("L").resize((w, h), 0))
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        full = np.zeros((h, w), np.uint8)
        full[h // 4 : h // 2, w // 4 : w // 2] = 255
        part = np.zeros((h, w), np.uint8)
        part[3 * h // 8 : h // 2, w // 4 : w // 2] = 255  # lower half of it

    full01 = (full > 0).astype(np.float32)
    part01 = (part > 0).astype(np.float32)
    num_step = 8 if args.tiny else 50

    # Step 1 — background plate over the dilated FULL mask (notebook cell 2;
    # mask_pool = [full mask] so the reference's forbit_area is empty).
    dil = np.asarray(dilate(jnp.asarray(full01), 20))
    t0 = time.time()
    bg = pipe.background_generation(
        img, (dil * 255).astype(np.uint8), "empty scene",
        guidance_scale=3.5, eta=1.0, method_type="tca",
        num_step=num_step, start_step=1, end_step=num_step,
        end_scale=0.5, seed=args.seed,
    )
    print(f"background plate: {time.time()-t0:.2f}s")

    # Step 2 — BrushNet blend: generated background only inside the part.
    m = part01[..., None]
    inp_bg = (img * (1 - m) + bg * m).astype(np.uint8)

    # Step 3 — coarse 2D edit of the part over the blended plate.
    coarse, target_mask, _ = re_edit_2d(img, part, args.edit_param, inp_bg)

    # Step 4 — regeneration; the rest of the object is constrained.
    cons = np.clip(full01 - part01, 0.0, 1.0)
    t0 = time.time()
    out = pipe.generation(
        img, part, coarse, target_mask, args.prompt,
        guidance_scale=4.0, eta=1.0, end_scale=0.0,
        num_step=num_step, start_step=max(1, num_step // 2),
        end_step=num_step, method_type="tca",
        use_auto_draw=True, reduce_inp_artifacts=True,
        cons_area=(cons * 255).astype(np.uint8), seed=args.seed,
    )
    print(f"partial edit: {time.time()-t0:.2f}s -> {out.shape}")

    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
