"""Generate the canonical diffusers SD-1.5 state-dict manifests
(key -> torch shape) from the public architecture layout, independent of
freefine_tpu's converter code.

The manifests pin the model topology: tests/test_weight_manifest.py
asserts that the converter's expected key+shape set on the full sd15
config equals these files exactly, both directions — so a misplaced
block, missing attention, or wrong channel count (the 673ba65 bug class)
fails a CPU test in seconds.

Layout source: the published runwayml/stable-diffusion-v1-5 checkpoint
(reference scripts/download_models.sh:23-47):
  unet  : UNet2DConditionModel, block_out=(320,640,1280,1280),
          layers_per_block=2, 3 CrossAttnDownBlock2D + DownBlock2D,
          UpBlock2D + 3 CrossAttnUpBlock2D (3 layers each),
          cross_attention_dim=768, conv proj_in/out (not linear)
  vae   : AutoencoderKL, block_out=(128,256,512,512), layers_per_block=2,
          latent_channels=4, mid attention
  text  : CLIP ViT-L/14 text tower, 12 layers, d=768, vocab 49408

Usage: python scripts/gen_sd15_manifest.py [outdir=tests/fixtures]
"""

import os
import sys


def _res(prefix, cin, cout, temb=1280):
    ks = {
        f"{prefix}.norm1.weight": (cin,),
        f"{prefix}.norm1.bias": (cin,),
        f"{prefix}.conv1.weight": (cout, cin, 3, 3),
        f"{prefix}.conv1.bias": (cout,),
        f"{prefix}.norm2.weight": (cout,),
        f"{prefix}.norm2.bias": (cout,),
        f"{prefix}.conv2.weight": (cout, cout, 3, 3),
        f"{prefix}.conv2.bias": (cout,),
    }
    if temb:
        ks[f"{prefix}.time_emb_proj.weight"] = (cout, temb)
        ks[f"{prefix}.time_emb_proj.bias"] = (cout,)
    if cin != cout:
        # UNet resnets use a 1x1 conv_shortcut; the VAE calls it the same
        ks[f"{prefix}.conv_shortcut.weight"] = (cout, cin, 1, 1)
        ks[f"{prefix}.conv_shortcut.bias"] = (cout,)
    return ks


def _transformer(prefix, ch, ctx=768, depth=1, linear_proj=False):
    """Transformer2DModel: `depth` BasicTransformerBlocks; conv projections
    for SD-1.5 (use_linear_projection=False), linear for SDXL."""
    inner = 4 * ch
    ks = {
        f"{prefix}.norm.weight": (ch,),
        f"{prefix}.norm.bias": (ch,),
    }
    proj_shape = (ch, ch) if linear_proj else (ch, ch, 1, 1)
    ks[f"{prefix}.proj_in.weight"] = proj_shape
    ks[f"{prefix}.proj_in.bias"] = (ch,)
    ks[f"{prefix}.proj_out.weight"] = proj_shape
    ks[f"{prefix}.proj_out.bias"] = (ch,)
    for d in range(depth):
        b = f"{prefix}.transformer_blocks.{d}"
        for n in ("norm1", "norm2", "norm3"):
            ks[f"{b}.{n}.weight"] = (ch,)
            ks[f"{b}.{n}.bias"] = (ch,)
        for attn, kvdim in (("attn1", ch), ("attn2", ctx)):
            ks[f"{b}.{attn}.to_q.weight"] = (ch, ch)
            ks[f"{b}.{attn}.to_k.weight"] = (ch, kvdim)
            ks[f"{b}.{attn}.to_v.weight"] = (ch, kvdim)
            ks[f"{b}.{attn}.to_out.0.weight"] = (ch, ch)
            ks[f"{b}.{attn}.to_out.0.bias"] = (ch,)
        # GEGLU feed-forward: proj doubles the inner width
        ks[f"{b}.ff.net.0.proj.weight"] = (2 * inner, ch)
        ks[f"{b}.ff.net.0.proj.bias"] = (2 * inner,)
        ks[f"{b}.ff.net.2.weight"] = (ch, inner)
        ks[f"{b}.ff.net.2.bias"] = (ch,)
    return ks


def unet_manifest(block_out=(320, 640, 1280, 1280), ctx=768,
                  linear_proj=False):
    temb = block_out[0] * 4
    ks = {
        "conv_in.weight": (block_out[0], 4, 3, 3),
        "conv_in.bias": (block_out[0],),
        "time_embedding.linear_1.weight": (temb, block_out[0]),
        "time_embedding.linear_1.bias": (temb,),
        "time_embedding.linear_2.weight": (temb, temb),
        "time_embedding.linear_2.bias": (temb,),
        "conv_norm_out.weight": (block_out[0],),
        "conv_norm_out.bias": (block_out[0],),
        "conv_out.weight": (4, block_out[0], 3, 3),
        "conv_out.bias": (4,),
    }
    n = len(block_out)
    # down path: CrossAttn x (n-1) + plain DownBlock2D, 2 layers each
    ch = block_out[0]
    for i, out in enumerate(block_out):
        for j in range(2):
            cin = ch if j == 0 else out
            ks.update(_res(f"down_blocks.{i}.resnets.{j}", cin, out, temb))
            if i < n - 1:
                ks.update(
                    _transformer(f"down_blocks.{i}.attentions.{j}", out, ctx,
                                 linear_proj=linear_proj)
                )
        if i < n - 1:
            ks[f"down_blocks.{i}.downsamplers.0.conv.weight"] = (out, out, 3, 3)
            ks[f"down_blocks.{i}.downsamplers.0.conv.bias"] = (out,)
        ch = out
    # mid
    m = block_out[-1]
    ks.update(_res("mid_block.resnets.0", m, m, temb))
    ks.update(_res("mid_block.resnets.1", m, m, temb))
    ks.update(_transformer("mid_block.attentions.0", m, ctx,
                           linear_proj=linear_proj))
    # up path: UpBlock2D + CrossAttn x (n-1), 3 layers each, skip concat
    rev = list(reversed(block_out))            # (1280, 1280, 640, 320)
    prev = rev[0]
    for i, out in enumerate(rev):
        skip_in = rev[min(i + 1, n - 1)]
        for j in range(3):
            res_skip = skip_in if j == 2 else out
            cin = (prev if j == 0 else out) + res_skip
            ks.update(_res(f"up_blocks.{i}.resnets.{j}", cin, out, temb))
            if i > 0:
                ks.update(
                    _transformer(f"up_blocks.{i}.attentions.{j}", out, ctx,
                                 linear_proj=linear_proj)
                )
        if i < n - 1:
            ks[f"up_blocks.{i}.upsamplers.0.conv.weight"] = (out, out, 3, 3)
            ks[f"up_blocks.{i}.upsamplers.0.conv.bias"] = (out,)
        prev = out
    return ks


def sdxl_unet_manifest(block_out=(320, 640, 1280), ctx=2048,
                       depths=(1, 2, 10), add_dim=2816):
    """SDXL-base UNet (stabilityai/stable-diffusion-xl-base-1.0):
    DownBlock2D + 2 CrossAttn levels with transformer depths (2, 10),
    linear projections, added text_time conditioning."""
    temb = block_out[0] * 4
    ks = {
        "conv_in.weight": (block_out[0], 4, 3, 3),
        "conv_in.bias": (block_out[0],),
        "time_embedding.linear_1.weight": (temb, block_out[0]),
        "time_embedding.linear_1.bias": (temb,),
        "time_embedding.linear_2.weight": (temb, temb),
        "time_embedding.linear_2.bias": (temb,),
        "add_embedding.linear_1.weight": (temb, add_dim),
        "add_embedding.linear_1.bias": (temb,),
        "add_embedding.linear_2.weight": (temb, temb),
        "add_embedding.linear_2.bias": (temb,),
        "conv_norm_out.weight": (block_out[0],),
        "conv_norm_out.bias": (block_out[0],),
        "conv_out.weight": (4, block_out[0], 3, 3),
        "conv_out.bias": (4,),
    }
    n = len(block_out)
    has_attn_down = (False, True, True)
    ch = block_out[0]
    for i, out in enumerate(block_out):
        for j in range(2):
            cin = ch if j == 0 else out
            ks.update(_res(f"down_blocks.{i}.resnets.{j}", cin, out, temb))
            if has_attn_down[i]:
                ks.update(_transformer(
                    f"down_blocks.{i}.attentions.{j}", out, ctx,
                    depth=depths[i], linear_proj=True,
                ))
        if i < n - 1:
            ks[f"down_blocks.{i}.downsamplers.0.conv.weight"] = (out, out, 3, 3)
            ks[f"down_blocks.{i}.downsamplers.0.conv.bias"] = (out,)
        ch = out
    m = block_out[-1]
    ks.update(_res("mid_block.resnets.0", m, m, temb))
    ks.update(_res("mid_block.resnets.1", m, m, temb))
    ks.update(_transformer("mid_block.attentions.0", m, ctx,
                           depth=depths[-1], linear_proj=True))
    rev = list(reversed(block_out))            # (1280, 640, 320)
    rev_depths = list(reversed(depths))
    has_attn_up = (True, True, False)
    prev = rev[0]
    for i, out in enumerate(rev):
        skip_in = rev[min(i + 1, n - 1)]
        for j in range(3):
            res_skip = skip_in if j == 2 else out
            cin = (prev if j == 0 else out) + res_skip
            ks.update(_res(f"up_blocks.{i}.resnets.{j}", cin, out, temb))
            if has_attn_up[i]:
                ks.update(_transformer(
                    f"up_blocks.{i}.attentions.{j}", out, ctx,
                    depth=rev_depths[i], linear_proj=True,
                ))
        if i < n - 1:
            ks[f"up_blocks.{i}.upsamplers.0.conv.weight"] = (out, out, 3, 3)
            ks[f"up_blocks.{i}.upsamplers.0.conv.bias"] = (out,)
        prev = out
    return ks


def _vae_attn(prefix, ch):
    ks = {
        f"{prefix}.group_norm.weight": (ch,),
        f"{prefix}.group_norm.bias": (ch,),
    }
    for p in ("to_q", "to_k", "to_v"):
        ks[f"{prefix}.{p}.weight"] = (ch, ch)
        ks[f"{prefix}.{p}.bias"] = (ch,)
    ks[f"{prefix}.to_out.0.weight"] = (ch, ch)
    ks[f"{prefix}.to_out.0.bias"] = (ch,)
    return ks


def vae_manifest(block_out=(128, 256, 512, 512), latent=4):
    ks = {}
    n = len(block_out)
    # encoder
    ks["encoder.conv_in.weight"] = (block_out[0], 3, 3, 3)
    ks["encoder.conv_in.bias"] = (block_out[0],)
    ch = block_out[0]
    for i, out in enumerate(block_out):
        for j in range(2):
            cin = ch if j == 0 else out
            ks.update(
                _res(f"encoder.down_blocks.{i}.resnets.{j}", cin, out, temb=0)
            )
        if i < n - 1:
            ks[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = (
                out, out, 3, 3)
            ks[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = (out,)
        ch = out
    m = block_out[-1]
    ks.update(_res("encoder.mid_block.resnets.0", m, m, temb=0))
    ks.update(_res("encoder.mid_block.resnets.1", m, m, temb=0))
    ks.update(_vae_attn("encoder.mid_block.attentions.0", m))
    ks["encoder.conv_norm_out.weight"] = (m,)
    ks["encoder.conv_norm_out.bias"] = (m,)
    ks["encoder.conv_out.weight"] = (2 * latent, m, 3, 3)
    ks["encoder.conv_out.bias"] = (2 * latent,)
    ks["quant_conv.weight"] = (2 * latent, 2 * latent, 1, 1)
    ks["quant_conv.bias"] = (2 * latent,)
    # decoder
    ks["post_quant_conv.weight"] = (latent, latent, 1, 1)
    ks["post_quant_conv.bias"] = (latent,)
    ks["decoder.conv_in.weight"] = (m, latent, 3, 3)
    ks["decoder.conv_in.bias"] = (m,)
    ks.update(_res("decoder.mid_block.resnets.0", m, m, temb=0))
    ks.update(_res("decoder.mid_block.resnets.1", m, m, temb=0))
    ks.update(_vae_attn("decoder.mid_block.attentions.0", m))
    rev = list(reversed(block_out))            # (512, 512, 256, 128)
    prev = rev[0]
    for i, out in enumerate(rev):
        for j in range(3):                     # decoder: 3 resnets, no skip
            cin = prev if j == 0 else out
            ks.update(
                _res(f"decoder.up_blocks.{i}.resnets.{j}", cin, out, temb=0)
            )
        if i < n - 1:
            ks[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = (
                out, out, 3, 3)
            ks[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = (out,)
        prev = out
    ks["decoder.conv_norm_out.weight"] = (rev[-1],)
    ks["decoder.conv_norm_out.bias"] = (rev[-1],)
    ks["decoder.conv_out.weight"] = (3, rev[-1], 3, 3)
    ks["decoder.conv_out.bias"] = (3,)
    return ks


def text_manifest(layers=12, d=768, vocab=49408, maxlen=77, mlp_mult=4):
    ks = {
        "text_model.embeddings.token_embedding.weight": (vocab, d),
        "text_model.embeddings.position_embedding.weight": (maxlen, d),
        "text_model.final_layer_norm.weight": (d,),
        "text_model.final_layer_norm.bias": (d,),
    }
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        for n in ("layer_norm1", "layer_norm2"):
            ks[f"{p}.{n}.weight"] = (d,)
            ks[f"{p}.{n}.bias"] = (d,)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            ks[f"{p}.self_attn.{proj}.weight"] = (d, d)
            ks[f"{p}.self_attn.{proj}.bias"] = (d,)
        ks[f"{p}.mlp.fc1.weight"] = (mlp_mult * d, d)
        ks[f"{p}.mlp.fc1.bias"] = (mlp_mult * d,)
        ks[f"{p}.mlp.fc2.weight"] = (d, mlp_mult * d)
        ks[f"{p}.mlp.fc2.bias"] = (d,)
    return ks


def write(ks, path):
    with open(path, "w") as f:
        for k in sorted(ks):
            f.write(f"{k} {','.join(map(str, ks[k]))}\n")
    print(f"{path}: {len(ks)} keys")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures"
    os.makedirs(outdir, exist_ok=True)
    write(unet_manifest(), os.path.join(outdir, "sd15_unet_keys.txt"))
    write(vae_manifest(), os.path.join(outdir, "sd15_vae_keys.txt"))
    write(text_manifest(), os.path.join(outdir, "sd15_text_keys.txt"))
    write(sdxl_unet_manifest(), os.path.join(outdir, "sdxl_unet_keys.txt"))
    # SD-2.1 (stabilityai/stable-diffusion-2-1): the DIFT/MD featurizer
    # backbone — SD-1.5 block layout with 1024-d context, linear
    # projections, and a 23-layer d=1024 OpenCLIP-derived text tower.
    write(unet_manifest(ctx=1024, linear_proj=True),
          os.path.join(outdir, "sd21_unet_keys.txt"))
    write(text_manifest(layers=23, d=1024),
          os.path.join(outdir, "sd21_text_keys.txt"))
