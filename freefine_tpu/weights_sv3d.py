"""SV3D weight conversion: sgm VideoUNet state dicts -> flax VideoUNet.

The sgm checkpoint (sv3d_p.safetensors) stores the video UNet under
`model.diffusion_model.*` in LDM block naming (generative-models/sgm/
modules/diffusionmodules/video_model.py + video_attention.py):

  input_blocks.0.0                conv_in
  input_blocks.i.0                VideoResBlock: spatial ResBlock leaves
                                  (in_layers.0/2, emb_layers.1,
                                  out_layers.0/3, skip_connection) +
                                  .time_stack.* (temporal ResBlock with
                                  (3,1,1) convs) + .time_mixer.mix_factor
  input_blocks.i.1                SpatialVideoTransformer: norm, proj_in,
                                  transformer_blocks.0.{attn1,attn2,ff,
                                  norm1..3}, time_stack.0.{norm_in, ff_in,
                                  attn1, attn2, ff, norm1..3},
                                  time_pos_embed.0/2, time_mixer, proj_out
  middle_block.{0,1,2}, output_blocks.0..11 (+ upsample convs), out.0/2,
  time_embed.0/2, label_emb.0.0/0.2

This module maps those names onto freefine_tpu.models.video_unet's modules
(down_{i}_res_{j} / down_{i}_attn_{j} / mid_* / up_* / conv_in / out_*),
tree-driven with per-leaf shape validation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_P = "model.diffusion_model."

# spatial/temporal ResBlock leaf renames (flax -> sgm suffix)
_RES = {
    "norm1": "in_layers.0", "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1",
    "norm2": "out_layers.0", "conv2": "out_layers.3",
    "conv_shortcut": "skip_connection",
}
# transformer-block leaf renames inside transformer_blocks.0
_ATTN = {
    "norm1": "norm1", "norm2": "norm2", "norm3": "norm3",
    "attn1_to_q": "attn1.to_q", "attn1_to_k": "attn1.to_k",
    "attn1_to_v": "attn1.to_v", "attn1_to_out": "attn1.to_out.0",
    "attn2_to_q": "attn2.to_q", "attn2_to_k": "attn2.to_k",
    "attn2_to_v": "attn2.to_v", "attn2_to_out": "attn2.to_out.0",
}
_TIME_ATTN = dict(_ATTN)
_TIME_ATTN["norm_in"] = "norm_in"

_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias"}


def _block_positions(channel_mult=(1, 2, 4, 4), num_res=2):
    """flax module name -> (sgm block list, index, module slot)."""
    pos = {}
    i = 1
    n = len(channel_mult)
    for lvl in range(n):
        for j in range(num_res):
            pos[f"down_{lvl}_res_{j}"] = ("input_blocks", i, 0)
            pos[f"down_{lvl}_attn_{j}"] = ("input_blocks", i, 1)
            i += 1
        if lvl < n - 1:
            pos[f"down_{lvl}_ds"] = ("input_blocks", i, 0)
            i += 1
    pos["mid_res_0"] = ("middle_block", 0, None)
    pos["mid_attn"] = ("middle_block", 1, None)
    pos["mid_res_1"] = ("middle_block", 2, None)
    i = 0
    for u in range(n):
        lvl = n - 1 - u
        for j in range(num_res + 1):
            pos[f"up_{u}_res_{j}"] = ("output_blocks", i, 0)
            pos[f"up_{u}_attn_{j}"] = ("output_blocks", i, 1)
            if j == num_res:
                # upsampler module slot: after attention if present
                pos[f"up_{u}_us"] = (
                    "output_blocks", i, None,  # slot resolved at fetch time
                )
            i += 1
    return pos


def _sgm_prefix(kind, idx, slot):
    if kind == "middle_block":
        return f"{_P}middle_block.{idx}"
    if slot is None:
        return f"{_P}{kind}.{idx}"
    return f"{_P}{kind}.{idx}.{slot}"


def _fetch(sd, key, leaf, shape, temporal_conv=False, deconv=False):
    t = np.asarray(sd[key])
    if leaf == "kernel":
        if t.ndim == 5:  # (3,1,1) temporal conv [O, I, 3, 1, 1]
            t = t.reshape(t.shape[0], t.shape[1], 3, 1).transpose(2, 3, 1, 0)
        elif t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)
        elif t.ndim == 2:
            t = t.T
    if t.shape != tuple(shape):
        raise ValueError(f"{key}: {t.shape} vs {tuple(shape)}")
    return t


def convert_sv3d_unet(flax_params, sd: Dict[str, np.ndarray], dtype=None,
                      channel_mult=(1, 2, 4, 4), num_res=2):
    """sgm sv3d state dict -> flax VideoUNet params (tree-driven)."""
    pos = _block_positions(channel_mult, num_res)
    params = flax_params["params"]
    out = {}

    def conv_pair(base, sub, temporal=False):
        return {
            leaf: jnp.asarray(
                _fetch(sd, f"{base}.{_LEAF[leaf]}", leaf, arr.shape,
                       temporal_conv=temporal),
                dtype or arr.dtype,
            )
            for leaf, arr in sub.items()
        }

    def norm_pair(base, wrapper):
        # LayerNorm32 wraps the actual norm one level deeper; GroupNorm32
        # owns scale/bias directly (flat) since the fused-GN rework
        inner_name, inner = next(iter(wrapper.items()))
        if not isinstance(inner, dict):  # flat: wrapper IS the leaf dict
            return conv_pair(base, wrapper)
        return {inner_name: conv_pair(base, inner)}

    def res_block(base, sub):
        blk = {}
        for name, inner in sub.items():
            if name == "time_mixer":
                blk[name] = {"mix_factor": jnp.asarray(
                    np.asarray(sd[f"{base}.time_mixer.mix_factor"]).reshape(1),
                    dtype or inner["mix_factor"].dtype,
                )}
            elif name == "time_stack":
                tblk = {}
                for n2, i2 in inner.items():
                    if n2 in ("norm1", "norm2"):
                        tblk[n2] = norm_pair(
                            f"{base}.time_stack.{_RES[n2]}", i2
                        )
                    else:
                        tblk[n2] = conv_pair(
                            f"{base}.time_stack.{_RES[n2]}", i2, temporal=True
                        )
                blk[name] = tblk
            elif name in ("norm1", "norm2"):
                blk[name] = norm_pair(f"{base}.{_RES[name]}", inner)
            else:
                blk[name] = conv_pair(f"{base}.{_RES[name]}", inner)
        return blk

    def ff_tree(base, sub):
        return {
            "net_0": {"proj": conv_pair(f"{base}.net.0.proj", sub["net_0"]["proj"])},
            "net_2": conv_pair(f"{base}.net.2", sub["net_2"]),
        }

    def attn_block(base, sub):
        blk = {}
        tb = f"{base}.transformer_blocks.0"
        for name, inner in sub.items():
            if name == "norm":
                blk[name] = norm_pair(f"{base}.norm", inner)
            elif name in ("proj_in", "proj_out"):
                blk[name] = conv_pair(f"{base}.{name}", inner)
            elif name == "time_mixer":
                blk[name] = {"mix_factor": jnp.asarray(
                    np.asarray(sd[f"{base}.time_mixer.mix_factor"]).reshape(1),
                    dtype or inner["mix_factor"].dtype,
                )}
            elif name == "ff":
                blk[name] = ff_tree(f"{tb}.ff", inner)
            elif name in ("norm1", "norm2", "norm3"):
                blk[name] = norm_pair(f"{tb}.{name}", inner)
            elif name.startswith("attn"):
                blk[name] = conv_pair(f"{tb}.{_ATTN[name]}", inner)
            elif name == "time_stack":
                ts = f"{base}.time_stack.0"
                tblk = {}
                for n2, i2 in inner.items():
                    if n2 in ("norm_in", "norm1", "norm2", "norm3"):
                        tblk[n2] = norm_pair(f"{ts}.{n2}", i2)
                    elif n2 == "ff_in":
                        tblk[n2] = ff_tree(f"{ts}.ff_in", i2)
                    elif n2 == "ff":
                        tblk[n2] = ff_tree(f"{ts}.ff", i2)
                    elif n2 == "time_pos_embed_0":
                        tblk[n2] = conv_pair(f"{base}.time_pos_embed.0", i2)
                    elif n2 == "time_pos_embed_2":
                        tblk[n2] = conv_pair(f"{base}.time_pos_embed.2", i2)
                    elif n2.startswith("attn"):
                        tblk[n2] = conv_pair(f"{ts}.{_TIME_ATTN[n2]}", i2)
                    else:
                        raise KeyError(n2)
                blk[name] = tblk
            else:
                raise KeyError(name)
        return blk

    for name, sub in params.items():
        if name == "conv_in":
            out[name] = conv_pair(f"{_P}input_blocks.0.0", sub)
        elif name == "time_embed":
            out[name] = {
                "linear_1": conv_pair(f"{_P}time_embed.0", sub["linear_1"]),
                "linear_2": conv_pair(f"{_P}time_embed.2", sub["linear_2"]),
            }
        elif name == "label_emb_0":
            out[name] = conv_pair(f"{_P}label_emb.0.0", sub)
        elif name == "label_emb_2":
            out[name] = conv_pair(f"{_P}label_emb.0.2", sub)
        elif name == "out_norm":
            out[name] = norm_pair(f"{_P}out.0", sub)
        elif name == "out_conv":
            out[name] = conv_pair(f"{_P}out.2", sub)
        elif name.endswith("_ds"):
            kind, idx, slot = pos[name]
            out[name] = conv_pair(f"{_sgm_prefix(kind, idx, slot)}.op", sub)
        elif name.endswith("_us"):
            kind, idx, _ = pos[name]
            # upsampler slot: 2 when the block has an attention module, 1
            # otherwise (probe the state dict)
            slot = 2 if f"{_P}{kind}.{idx}.1.proj_in.weight" in sd else 1
            out[name] = conv_pair(f"{_P}{kind}.{idx}.{slot}.conv", sub)
        elif "_res_" in name or name.startswith("mid_res"):
            kind, idx, slot = pos[name]
            out[name] = res_block(_sgm_prefix(kind, idx, slot), sub)
        elif "_attn" in name:
            kind, idx, slot = pos[name]
            out[name] = attn_block(_sgm_prefix(kind, idx, slot), sub)
        else:
            raise KeyError(f"unexpected VideoUNet module {name}")
    return {"params": out}


def convert_sv3d_clip_image(flax_params, sd: Dict, dtype=None):
    """SV3D checkpoint conditioner -> flax CLIPImageEncoder(clip_vit_h14).

    sv3d_p.safetensors embeds the FrozenOpenCLIPImagePredictionEmbedder's
    open_clip ViT-H visual tower (sv3d_p.yaml conditioner_config;
    sgm/modules/encoders/modules.py:574-622 — exact-GELU, like HPS) under
    `conditioner.embedders.0.open_clip.model.visual.*`; this is the same
    open_clip layout `weights.convert_open_clip_vision` consumes, re-prefixed.
    """
    from freefine_tpu.weights import convert_open_clip_vision

    return convert_open_clip_vision(
        flax_params, sd,
        prefix="conditioner.embedders.0.open_clip.model.visual.",
        dtype=dtype,
    )
