"""Depth-based 3D edit — parity with the reference 3D editing path
(evaluation/FreeFine/freefine_batch_infer_3d_depth.py + src/utils/
geo_utils.py): Depth-Anything depth -> point-cloud transform -> softmax-z
splat -> detail-preserving regeneration (start_step=15, use_auto_draw off
with the rendered mask as draw mask).

Usage: python examples/edit_3d_depth.py --tiny
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
    ap.add_argument("--depth-checkpoint", default=None,
                    help="Depth-Anything params (msgpack); synthetic depth otherwise")
    ap.add_argument("--image", default=None)
    ap.add_argument("--mask", default=None)
    ap.add_argument("--prompt", default="a photo")
    ap.add_argument("--ry", type=float, default=20.0, help="y-rotation degrees")
    ap.add_argument("--out", default="edit3d_out.png")
    args = ap.parse_args()

    import jax

    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.ops.point_splat import re_edit_3d_depth
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
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[h // 3 : 2 * h // 3, w // 3 : 2 * w // 3] = 255

    # depth: Depth-Anything if weights provided, else a synthetic plane
    if args.depth_checkpoint:
        import flax.serialization
        import jax.numpy as jnp

        from freefine_tpu.models.depth_anything import (
            DepthAnything,
            depth_anything_vits,
            preprocess_depth_input,
        )

        model = DepthAnything(depth_anything_vits())
        with open(args.depth_checkpoint, "rb") as f:
            params = flax.serialization.msgpack_restore(f.read())
        x = preprocess_depth_input(jnp.asarray(img))
        d = np.asarray(model.apply(params, x)[0])
        d = np.asarray(jax.image.resize(jnp.asarray(d), (h, w), "linear"))
        depth = d.max() - d + 1.0  # disparity -> depth
    else:
        depth = np.full((h, w), 5.0, np.float32)
        depth += np.linspace(0, 1.5, w)[None, :].astype(np.float32)

    t0 = time.time()
    coarse, tgt_mask, _ = re_edit_3d_depth(
        img, mask, depth, [0, 0, 0, 0, args.ry, 0, 1, 1, 1],
        focal_length_x=0.92 * w, focal_length_y=0.92 * w,
    )
    print(f"3D coarse edit: {time.time()-t0:.2f}s")

    num_step = 8 if args.tiny else 50
    start_step = 3 if args.tiny else 15
    t0 = time.time()
    out = pipe.generation(
        img, mask, coarse, tgt_mask, args.prompt,
        guidance_scale=7.5, eta=1.0,
        num_step=num_step, start_step=start_step,
        end_step=max(1, num_step // 5),
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
    )
    print(f"regeneration: {time.time()-t0:.2f}s -> {out.shape}")

    from PIL import Image

    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
