"""Video diffusion UNet (SV3D_p architecture) in Flax, NHWC.

Rebuilds the capability of the reference's sgm `VideoUNet`
(/root/reference/generative-models/sgm/modules/diffusionmodules/
video_model.py:89-670) as configured for SV3D_p
(scripts/sampling/configs/sv3d_p.yaml): in 8ch (noisy latent + concat cond
frame), 320 base channels, mult (1,2,4,4), 2 res blocks, attention at the
three finest scales with 64-dim heads, 1024-d CLIP-image cross-attention
context, 1280-d vector conditioning (cond_aug 256 + polar 512 + azimuth
512) added to the timestep embedding, and temporal mixing after every
spatial res/transformer block:

  * VideoResBlock — a temporal ResBlock with (3,1,1) conv over frames,
    alpha-blended with the spatial output via a learned sigmoid mix factor
    ("learned_with_images" AlphaBlender, video_model.py:17-88);
  * VideoTransformerBlock — per-pixel self-attention over the frame axis
    with its own frame-position embedding, blended the same way
    (:447-670).

The whole 21-frame batch is one [T, H, W, C] array — time mixing is a pair
of reshapes around a standard attention, which XLA fuses; no 5-D conv
gymnastics.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.models.layers import (
    GroupNorm32,
    LayerNorm32,
    FeedForward,
    TimestepEmbed,
    timestep_embedding,
)
from freefine_tpu.ops.attention import masked_sdpa, sdpa


@dataclasses.dataclass(frozen=True)
class VideoUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_levels: Tuple[bool, ...] = (True, True, True, False)
    num_head_channels: int = 64
    context_dim: int = 1024
    adm_in_channels: int = 1280
    num_frames: int = 21
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16


def sv3d_config() -> VideoUNetConfig:
    return VideoUNetConfig()


class AlphaBlender(nn.Module):
    """Learned spatial/temporal blend: out = a*spatial + (1-a)*temporal
    with a = sigmoid(mix_factor) (sgm util.py AlphaBlender.forward:388-399,
    merge_strategy='learned_with_images' on the video path; the earlier
    a*temporal form was reversed — caught by the sgm golden test)."""

    @nn.compact
    def __call__(self, spatial, temporal):
        mix = self.param("mix_factor", nn.initializers.zeros, (1,))
        a = jax.nn.sigmoid(mix[0]).astype(spatial.dtype)
        return a * spatial + (1.0 - a) * temporal


class TemporalResBlock(nn.Module):
    """Temporal ResBlock over the frame axis with (3,1,1) conv kernels."""

    channels: int
    num_frames: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        # x: [B*T, H, W, C] -> time-major [B*H*W grouped via reshape]
        bt, h, w, c = x.shape
        b = bt // self.num_frames
        t = self.num_frames
        # torch runs this block on the 5-D [B, C, T, H, W] tensor, so its
        # GroupNorms reduce over (C/g, T, H, W) JOINTLY across frames
        # (sgm ResBlock with dims=3); folding T into the row axis gives
        # the same statistics in NHWC.  (Per-frame stats here was a real
        # deviation caught by the sgm golden test.)
        y = GroupNorm32(self.norm_num_groups, name="norm1")(
            x.reshape(b, t * h, w, c)
        )
        y = nn.silu(y).reshape(b, t, h, w, c)
        # conv over (time, 1, 1): Conv with kernel (3,1,1) on [b, t, h*w, c]
        y = nn.Conv(
            self.channels, (3, 1), padding="SAME", dtype=self.dtype, name="conv1"
        )(y.reshape(b, t, h * w, c))
        if temb is not None:
            proj = nn.Dense(self.channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )  # temb [B*T, E]
            y = y + proj.reshape(b, t, 1, self.channels)
        y = GroupNorm32(self.norm_num_groups, name="norm2")(
            y.reshape(b, t * h, w, self.channels)
        )
        y = nn.silu(y).reshape(b, t, h * w, self.channels)
        y = nn.Conv(
            self.channels, (3, 1), padding="SAME", dtype=self.dtype, name="conv2"
        )(y)
        return x + y.reshape(bt, h, w, self.channels)


class VideoResBlock(nn.Module):
    """Spatial ResBlock + temporal ResBlock + alpha blend
    (video_model.py:17-88)."""

    out_channels: int
    num_frames: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm32(self.norm_num_groups, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            tproj = nn.Dense(
                self.out_channels, dtype=self.dtype, name="time_emb_proj"
            )(nn.silu(temb))
            h = h + tproj[:, None, None, :]
        h = GroupNorm32(self.norm_num_groups, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        spatial = x + h
        temporal = TemporalResBlock(
            self.out_channels, self.num_frames, self.norm_num_groups,
            self.dtype, name="time_stack",
        )(spatial, temb)
        return AlphaBlender(name="time_mixer")(spatial, temporal)


class TemporalAttentionBlock(nn.Module):
    """Per-pixel transformer over the frame axis — the exact structure of
    sgm's VideoTransformerBlock with SV3D's configuration (video_attention.
    py:16-146; ff_in=True via extra_ff_mix_layer, temporal self-attn, then
    temporal CROSS-attn to the conditioning-frame context repeated per
    pixel — use_spatial_context=True, :245-258 — and a gated FF), with the
    frame-position embedding MLP applied before the block
    (time_pos_embed, :221-226)."""

    heads: int
    num_frames: int
    dtype: jnp.dtype = jnp.bfloat16

    def _attn(self, q_in, kv_in, c, name):
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{name}_to_q")(q_in)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{name}_to_k")(kv_in)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"{name}_to_v")(kv_in)
        a = sdpa(q, k, v, self.heads)
        return nn.Dense(c, dtype=self.dtype, name=f"{name}_to_out")(a)

    @nn.compact
    def __call__(self, tokens, time_context=None):
        # tokens: [B*T, S, C] -> [B*S, T, C]
        bt, s, c = tokens.shape
        b = bt // self.num_frames
        t = self.num_frames
        xt = tokens.reshape(b, t, s, c).transpose(0, 2, 1, 3).reshape(b * s, t, c)

        frame_ids = jnp.arange(t)
        pos = timestep_embedding(frame_ids, c).astype(self.dtype)
        pos = nn.Dense(c * 4, dtype=self.dtype, name="time_pos_embed_0")(pos)
        pos = nn.silu(pos)
        pos = nn.Dense(c, dtype=self.dtype, name="time_pos_embed_2")(pos)
        xt = xt + pos[None]

        # ff_in (extra_ff_mix_layer) with residual
        h = LayerNorm32(name="norm_in")(xt)
        xt = xt + FeedForward(dtype=self.dtype, name="ff_in")(h)

        # temporal self-attention
        h = LayerNorm32(name="norm1")(xt)
        xt = xt + self._attn(h, h, c, "attn1")

        # temporal cross-attention to the conditioning-frame context
        # (first-timestep context repeated per pixel, video_attention.py:
        # 249-255); falls back to self-attention when absent.
        h = LayerNorm32(name="norm2")(xt)
        if time_context is not None:
            # time_context: [B, 1, C_ctx] -> [B*S, 1, C_ctx]
            ctx = jnp.repeat(time_context, s, axis=0)
        else:
            ctx = h
        xt = xt + self._attn(h, ctx, c, "attn2")

        h = LayerNorm32(name="norm3")(xt)
        xt = xt + FeedForward(dtype=self.dtype, name="ff")(h)
        return xt.reshape(b, s, t, c).transpose(0, 2, 1, 3).reshape(bt, s, c)


class VideoSpatialTransformer(nn.Module):
    """Spatial transformer (linear proj) + temporal attention + blend."""

    heads: int
    num_frames: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        b, hh, ww, c = x.shape
        residual = x
        h = GroupNorm32(self.norm_num_groups, epsilon=1e-6, name="norm")(x)
        h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h.reshape(b, hh * ww, c))

        # spatial self-attention
        y = LayerNorm32(name="norm1")(h)
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="attn1_to_q")(y)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="attn1_to_k")(y)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="attn1_to_v")(y)
        # masked_sdpa: at SV3D geometry (72x72 = 5184 tokens x 21 frames)
        # dense S^2 logits exceed HBM; the padded flash path keeps it O(S)
        h = h + nn.Dense(c, dtype=self.dtype, name="attn1_to_out")(
            masked_sdpa(q, k, v, self.heads)
        )
        # cross-attention to the CLIP image context
        y = LayerNorm32(name="norm2")(h)
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="attn2_to_q")(y)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="attn2_to_k")(context)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="attn2_to_v")(context)
        h = h + nn.Dense(c, dtype=self.dtype, name="attn2_to_out")(
            sdpa(q, k, v, self.heads)
        )
        y = LayerNorm32(name="norm3")(h)
        h = h + FeedForward(dtype=self.dtype, name="ff")(y)

        # time-cross context: the conditioning frame's context row per batch
        # (use_spatial_context, video_attention.py:245-252)
        ctx_first = context.reshape(
            b // self.num_frames, self.num_frames, *context.shape[1:]
        )[:, 0]
        temporal = TemporalAttentionBlock(
            self.heads, self.num_frames, self.dtype, name="time_stack"
        )(h, time_context=ctx_first)
        h = AlphaBlender(name="time_mixer")(h, temporal)

        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return residual + h.reshape(b, hh, ww, c)


class VideoUNet(nn.Module):
    """SV3D video UNet.

    sample  [T, H, W, 8]   (noisy latent ++ concat cond-frame latent)
    sigma_emb_t scalar timestep/noise embedding input per frame [T]
    context [T, 1, 1024]   CLIP-image tokens
    y       [T, 1280]      vector conditioning (cond_aug, polar, azimuth)
    """

    config: VideoUNetConfig

    @nn.compact
    def __call__(self, sample, t_cont, context, y):
        cfg = self.config
        dtype = cfg.dtype
        ch0 = cfg.model_channels
        sample = sample.astype(dtype)
        context = context.astype(dtype)

        temb = TimestepEmbed(
            base_dim=ch0, embed_dim=ch0 * 4, dtype=dtype, name="time_embed"
        )(t_cont)
        yemb = nn.Dense(ch0 * 4, dtype=dtype, name="label_emb_0")(y.astype(dtype))
        yemb = nn.silu(yemb)
        yemb = nn.Dense(ch0 * 4, dtype=dtype, name="label_emb_2")(yemb)
        temb = temb + yemb

        def res(ch, name):
            return VideoResBlock(
                ch, cfg.num_frames, cfg.norm_num_groups, dtype, name=name
            )

        def attn(ch, name):
            return VideoSpatialTransformer(
                ch // cfg.num_head_channels, cfg.num_frames,
                cfg.norm_num_groups, dtype, name=name,
            )

        h = nn.Conv(ch0, (3, 3), dtype=dtype, name="conv_in")(sample)
        skips = [h]
        n = len(cfg.channel_mult)
        for i, mult in enumerate(cfg.channel_mult):
            ch = ch0 * mult
            for j in range(cfg.num_res_blocks):
                h = res(ch, f"down_{i}_res_{j}")(h, temb)
                if cfg.attention_levels[i]:
                    h = attn(ch, f"down_{i}_attn_{j}")(h, context)
                skips.append(h)
            if i < n - 1:
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=dtype, name=f"down_{i}_ds"
                )(h)  # torch pad=1, not SAME's (0,1) at even sizes
                skips.append(h)

        mid_ch = ch0 * cfg.channel_mult[-1]
        h = res(mid_ch, "mid_res_0")(h, temb)
        h = attn(mid_ch, "mid_attn")(h, context)
        h = res(mid_ch, "mid_res_1")(h, temb)

        for i in range(n):
            level = n - 1 - i
            ch = ch0 * cfg.channel_mult[level]
            for j in range(cfg.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res(ch, f"up_{i}_res_{j}")(h, temb)
                if cfg.attention_levels[level]:
                    h = attn(ch, f"up_{i}_attn_{j}")(h, context)
            if i < n - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(c, (3, 3), dtype=dtype, name=f"up_{i}_us")(h)

        h = GroupNorm32(cfg.norm_num_groups, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), dtype=dtype, name="out_conv")(h)
