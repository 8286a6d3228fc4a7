"""Generate the canonical diffusers PixArt-XL-2 transformer manifest
(key -> torch shape) from the published architecture layout, independent of
freefine_tpu's converter code.

Pins the DiT backbone topology the same way the sd15/sdxl manifests do:
tests/test_weight_manifest.py asserts the converter's expected key+shape
set on `pixart_xl2_dit_config()` equals this file exactly, both directions.

Layout source: the published PixArt-alpha/PixArt-XL-2-512x512 `transformer`
subfolder (diffusers PixArtTransformer2DModel):
  depth 28, hidden 1152 (16 heads x 72), patch 2 on the 64^2 SD latent,
  caption_channels 4096 (T5-XXL), cross_attention_dim 1152, out 8
  (learned sigma), adaLN-single without the 1024 model's additional
  resolution/aspect conditions.  The fixed sincos `pos_embed.pos_embed`
  buffer is non-persistent and not part of the state dict.

Usage: python scripts/gen_pixart_manifest.py [outdir=tests/fixtures]
"""

import os
import sys

D = 1152
DEPTH = 28
CAPTION = 4096
PATCH = 2
IN_C = 4
OUT_C = 8  # eps + learned sigma


def _attn(prefix, kv_in):
    ks = {}
    for name, inp in [("to_q", D), ("to_k", kv_in), ("to_v", kv_in)]:
        ks[f"{prefix}.{name}.weight"] = (D, inp)
        ks[f"{prefix}.{name}.bias"] = (D,)
    ks[f"{prefix}.to_out.0.weight"] = (D, D)
    ks[f"{prefix}.to_out.0.bias"] = (D,)
    return ks


def manifest():
    ks = {
        "pos_embed.proj.weight": (D, IN_C, PATCH, PATCH),
        "pos_embed.proj.bias": (D,),
        "adaln_single.emb.timestep_embedder.linear_1.weight": (D, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": (D,),
        "adaln_single.emb.timestep_embedder.linear_2.weight": (D, D),
        "adaln_single.emb.timestep_embedder.linear_2.bias": (D,),
        "adaln_single.linear.weight": (6 * D, D),
        "adaln_single.linear.bias": (6 * D,),
        "caption_projection.linear_1.weight": (D, CAPTION),
        "caption_projection.linear_1.bias": (D,),
        "caption_projection.linear_2.weight": (D, D),
        "caption_projection.linear_2.bias": (D,),
        "scale_shift_table": (2, D),
        "proj_out.weight": (PATCH * PATCH * OUT_C, D),
        "proj_out.bias": (PATCH * PATCH * OUT_C,),
    }
    for i in range(DEPTH):
        b = f"transformer_blocks.{i}"
        ks[f"{b}.scale_shift_table"] = (6, D)
        ks.update(_attn(f"{b}.attn1", D))
        ks.update(_attn(f"{b}.attn2", D))
        ks[f"{b}.ff.net.0.proj.weight"] = (4 * D, D)
        ks[f"{b}.ff.net.0.proj.bias"] = (4 * D,)
        ks[f"{b}.ff.net.2.weight"] = (D, 4 * D)
        ks[f"{b}.ff.net.2.bias"] = (D,)
    return ks


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures"
    os.makedirs(outdir, exist_ok=True)
    ks = manifest()
    path = os.path.join(outdir, "pixart_xl2_keys.txt")
    with open(path, "w") as f:
        for k in sorted(ks):
            f.write(f"{k} {','.join(map(str, ks[k]))}\n")
    print(f"wrote {len(ks)} keys -> {path}")


if __name__ == "__main__":
    main()
