"""Convert PyTorch checkpoints into freefine-tpu msgpack param files.

Usage:
  python scripts/convert_weights.py sd15      /path/to/sd15_diffusers_dir out/
  python scripts/convert_weights.py dinov2b   dinov2_vitb14.(pth|safetensors) out/
  python scripts/convert_weights.py dino_b16  dino_vitbase16.(pth|safetensors) out/
  python scripts/convert_weights.py clip_b32  clip_model.safetensors out/
  python scripts/convert_weights.py inception pt_inception.(pth|safetensors) out/

Outputs land in <out>/<name>.msgpack, the layout `freefine_tpu.metrics.main
--weights-dir` consumes.  .pth inputs need torch (cpu) installed;
.safetensors inputs need only the safetensors numpy backend.
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def load_state_dict(path):
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=[
        "sd15", "dinov2s", "dinov2b", "dino_b16", "clip_b32", "inception",
        "hps_text", "image_reward", "depth_anything",
    ])
    ap.add_argument("src")
    ap.add_argument("out_dir")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax

    from freefine_tpu import weights as W

    if args.kind == "sd15":
        from freefine_tpu.config import sd15_pipeline_config
        from freefine_tpu.pipeline import FreeFine, save_pipeline

        pipe = FreeFine(config=sd15_pipeline_config(), init_random=True)
        pipe.params = W.load_sd15(pipe, args.src)
        save_pipeline(pipe, osp.join(args.out_dir, "sd15_ckpt"))
        print(f"wrote {args.out_dir}/sd15_ckpt (orbax)")
        return

    tensors = load_state_dict(args.src)

    if args.kind in ("dinov2s", "dinov2b", "dino_b16"):
        import jax.numpy as jnp

        from freefine_tpu.models.dinov2 import (
            DINOv2, DINOv2Config, dinov2_vitb14, dinov2_vits14,
        )

        if args.kind == "dinov2s":
            cfg, name = dinov2_vits14(), "dinov2_vits14"
        elif args.kind == "dinov2b":
            cfg, name = dinov2_vitb14(), "dinov2_vitb14"
        else:
            cfg = DINOv2Config(dim=768, depth=12, heads=12, patch_size=16,
                               pos_embed_size=14)
            name = "dino_vitb16"
        model = DINOv2(cfg)
        p = model.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.patch_size * 2, cfg.patch_size * 2, 3)),
        )
        params = W.convert_dinov2(p, tensors)
        out = osp.join(args.out_dir, f"{name}.msgpack")
    elif args.kind == "clip_b32":
        import jax.numpy as jnp

        from freefine_tpu.models.clip_image import CLIPImageEncoder, clip_vit_b32

        model = CLIPImageEncoder(clip_vit_b32())
        p = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
        params = W.convert_clip_vision(p, tensors)
        out = osp.join(args.out_dir, "clip_b32.msgpack")
    elif args.kind == "depth_anything":
        import jax.numpy as jnp

        from freefine_tpu.models.depth_anything import (
            DepthAnything, depth_anything_vits,
        )

        model = DepthAnything(depth_anything_vits())
        p = model.init(jax.random.key(0), jnp.zeros((1, 518, 518, 3)))
        params = W.convert_depth_anything_hf(p, tensors)
        out = osp.join(args.out_dir, "depth_anything_vits.msgpack")
    elif args.kind == "hps_text":
        import jax.numpy as jnp

        from freefine_tpu.models.open_clip_text import (
            OpenCLIPText, open_clip_text_h14,
        )

        model = OpenCLIPText(open_clip_text_h14())
        p = model.init(jax.random.key(0), jnp.zeros((1, 77), jnp.int32))
        prefix = "text." if any(k.startswith("text.") for k in tensors) else ""
        params = W.convert_open_clip_text(p, tensors, prefix=prefix)
        out = osp.join(args.out_dir, "hps_text.msgpack")
    elif args.kind == "image_reward":
        import jax.numpy as jnp

        from freefine_tpu.models.blip import BlipConfig, ImageReward

        model = ImageReward(BlipConfig())
        p = model.init(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 35), jnp.int32), jnp.ones((1, 35), jnp.int32),
        )
        params = W.convert_blip_image_reward(p, tensors)
        out = osp.join(args.out_dir, "image_reward.msgpack")
    else:  # inception
        import jax.numpy as jnp

        from freefine_tpu.models.inception import InceptionV3FID

        model = InceptionV3FID()
        p = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
        params = W.convert_inception_fid(p, tensors)
        out = osp.join(args.out_dir, "inception_fid.msgpack")

    W.save_params(params, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
