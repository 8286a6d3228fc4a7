"""Building blocks for the SD UNet / VAE in Flax (NHWC, TPU-native).

Architecture matches Stable Diffusion v1.5's UNet2DConditionModel /
AutoencoderKL as loaded by the reference pipeline
(/root/reference/src/demo/model.py:94), re-expressed in channels-last layout
for TPU convolutions.  Attention layers route through the edit dispatch in
`freefine_tpu.ops.attention` instead of being monkey-patched at runtime
(reference `register_attention_control`, src/utils/attention.py:342-452).

Numerics: parameters and matmuls run in the configured dtype (bf16 in
production); GroupNorm/LayerNorm statistics and attention softmax accumulate
in float32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.edit import EditConfig, EditState
from freefine_tpu.ops import attention as attn_ops


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers `get_timestep_embedding`).

    Always float32: the embedding must not quantise the timestep.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin], -1) if flip_sin_to_cos else jnp.concatenate([sin, cos], -1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32, output cast back to the input dtype.

    `silu=True` fuses the activation into the norm; on TPU (when the
    [H, W, C] slab fits VMEM) the whole GN+SiLU runs as ONE Pallas pass —
    a single HBM read+write instead of XLA's stats-reduce + normalize
    pair (see ops/group_norm.py).  Param layout: scale/bias live directly
    on this module (same diffusers key either way — the converter's
    _flax_path_to_key treats the norm as one unit)."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, silu: bool = False):
        from freefine_tpu.ops.group_norm import (
            group_norm_reference,
            group_norm_silu,
            use_fused,
        )

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if x.ndim == 4 and use_fused(x.shape, self.num_groups,
                                     x.dtype.itemsize):
            return group_norm_silu(
                x, scale, bias, num_groups=self.num_groups,
                eps=self.epsilon, apply_silu=silu,
            )
        if x.ndim != 4:  # [B, S, C] attention norms: add a unit H axis
            return group_norm_reference(
                x[:, None], scale, bias, num_groups=self.num_groups,
                eps=self.epsilon, apply_silu=silu,
            )[:, 0]
        return group_norm_reference(
            x, scale, bias, num_groups=self.num_groups,
            eps=self.epsilon, apply_silu=silu,
        )


class TimestepEmbed(nn.Module):
    """time_proj + time_embedding MLP (Timesteps -> Linear/SiLU/Linear)."""

    base_dim: int            # sinusoid dim (= block_out_channels[0])
    embed_dim: int           # output dim (= 4 * base_dim)
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, timesteps):
        emb = timestep_embedding(
            timesteps, self.base_dim, self.flip_sin_to_cos, self.freq_shift
        ).astype(self.dtype)
        emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock(nn.Module):
    """SD ResnetBlock2D: GN/SiLU/Conv x2 with timestep injection."""

    out_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb=None):
        h = GroupNorm32(self.norm_num_groups, name="norm1")(x, silu=True)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm32(self.norm_num_groups, name="norm2")(h, silu=True)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # torch Conv2d(k=3, s=2, padding=1) pads (1,1); flax SAME pads
        # (0,1) at even sizes — a real off-by-one vs diffusers
        # Downsample2D, caught by the sgm video-UNet golden test
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)


class GEGLU(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim * 2, dtype=self.dtype, name="proj")(x)
        value, gate = jnp.split(h, 2, axis=-1)
        return value * nn.gelu(gate)


class FeedForward(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * 4, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class LayerNorm32(nn.Module):
    """LayerNorm computed in float32.

    epsilon defaults to torch's nn.LayerNorm 1e-5 (the convention of every
    torch reference model being re-hosted); ViT-family models override to
    1e-6 and BERT to 1e-12."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        out = nn.LayerNorm(
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32
        )(x.astype(jnp.float32))
        return out.astype(dtype)


class EditAttention(nn.Module):
    """One attention layer with q/k/v/out projections and edit dispatch.

    `is_cross=False` routes through `edit_self_attention`, else
    `edit_cross_attention`.  The `block_index`/`place` statics implement the
    reference's execution-order layer gating (attention.py:1051).
    """

    heads: int
    is_cross: bool
    dtype: jnp.dtype = jnp.bfloat16
    # SD UNets project q/k/v without bias; the PixArt DiT family with bias
    # (diffusers Attention(bias=True) in PixArtTransformer2DModel blocks).
    qkv_bias: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        *,
        edit_cfg: EditConfig,
        edit_state: Optional[EditState],
        block_index: int,
        place: str,
        context_extra=None,
        context_image=None,
    ):
        dim = x.shape[-1]
        ctx = x if context is None else context
        q = nn.Dense(
            dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q"
        )(x)
        to_k = nn.Dense(
            dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k"
        )
        to_v = nn.Dense(
            dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v"
        )
        ctx_k = ctx
        if (
            edit_cfg.mode == "design"
            and not self.is_cross
            and edit_state is not None
            and x.shape[1] in edit_state.local_region
        ):
            # DesignEdit key-input masking (model.py:374-396): the background
            # stream's self-attn KEYS come from hidden states zeroed inside
            # the removal hole; queries and values stay unmasked.
            keep = edit_state.local_region[x.shape[1]]       # [S], 1 = keep
            row = 1.0 - edit_state.share_gate * (1.0 - keep)
            rows = jnp.ones((x.shape[0], x.shape[1]), jnp.float32)
            rows = rows.at[edit_cfg.kv_source_stream].set(row)
            ctx_k = ctx * rows[:, :, None].astype(ctx.dtype)
        k, v = to_k(ctx_k), to_v(ctx)

        # Shared-reference capture pass: sow this layer's self-attn K/V so
        # same-source cases can consume the reference stream's context
        # without re-running it (pipeline.sample_edit_loop_shared).  Gated
        # exactly like the TCA consumer (place scope + layer range).
        if (
            edit_cfg.store_kv
            and not self.is_cross
            and place in edit_cfg.tca_scope
            and edit_cfg.block_gated(block_index)
        ):
            self.sow("intermediates", f"ref_kv_{block_index}", (k, v))

        # opt-in debug instrument: sow <=32x32 attention maps (the reference
        # AttentionStore, attention.py:565-638); collected via
        # apply(..., mutable=["intermediates"])
        if edit_cfg.store_attention and q.shape[1] <= 32 * 32:
            self.sow(
                "intermediates", "attn_probs",
                attn_ops.attention_probs(q, k, self.heads),
            )

        if (
            self.is_cross
            and edit_cfg.sow_token_attn
            and edit_state is not None
            and edit_state.token_select is not None
        ):
            self.sow(
                "intermediates", f"token_attn_{place}",
                attn_ops.token_attention_maps(
                    q, k, self.heads, edit_state.token_select
                ),
            )

        if (
            edit_cfg.mode == "geodiff"
            and edit_state is not None
            and edit_state.warp_coords is not None
            and x.shape[1] in edit_state.warp_coords
        ):
            # GeoDiffuser attention sharing + loss sowing (losses only at
            # the >=32^2 grids, removal restricted to 32^2 for memory —
            # attention_processors.py:462,505)
            seq = x.shape[1]
            compute_losses = seq >= edit_cfg.geodiff_loss_seq
            compute_removal = seq == edit_cfg.geodiff_loss_seq
            out, losses = attn_ops.geodiff_attention(
                q, k, v, self.heads,
                edit_state.warp_coords[seq],
                edit_state.fg_ref[seq], edit_state.fg_retain[seq],
                edit_state.share_gate, self.is_cross,
                compute_losses, compute_removal,
                # geodiff repurposes local_region as the amodal-ring pyramid
                m_amodal=(
                    edit_state.local_region[seq]
                    if seq in edit_state.local_region else None
                ),
            )
            for name, val in losses.items():
                self.sow("intermediates", f"geodiff_{name}", val)
            return nn.Dense(dim, dtype=self.dtype, name="to_out_0")(out)

        if self.is_cross:
            k_extra = v_extra = None
            if context_extra is not None:
                k_extra, v_extra = to_k(context_extra), to_v(context_extra)
            h = attn_ops.edit_cross_attention(
                q, k, v, self.heads, edit_cfg, edit_state,
                k_extra=k_extra, v_extra=v_extra,
            )
            if edit_cfg.ip_scale > 0:
                # IP-Adapter decoupled cross-attention: image tokens get
                # their own K/V projections, added before to_out
                # (IPAttnProcessor; loaded by RegionDrag cycle_sde.py:25-31)
                assert context_image is not None, (
                    "ip_scale > 0 needs context_image tokens"
                )
                k_ip = nn.Dense(
                    dim, use_bias=False, dtype=self.dtype, name="to_k_ip"
                )(context_image.astype(self.dtype))
                v_ip = nn.Dense(
                    dim, use_bias=False, dtype=self.dtype, name="to_v_ip"
                )(context_image.astype(self.dtype))
                h = h + edit_cfg.ip_scale * attn_ops.sdpa(
                    q, k_ip, v_ip, self.heads
                )
        else:
            h = attn_ops.edit_self_attention(
                q, k, v, self.heads, edit_cfg, edit_state, block_index, place
            )
        return nn.Dense(dim, dtype=self.dtype, name="to_out_0")(h)


class BasicTransformerBlock(nn.Module):
    """Self-attn + cross-attn + GEGLU FF with pre-LayerNorms."""

    heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x, context, *, edit_cfg, edit_state, block_index, place,
        context_extra=None, context_image=None,
    ):
        h = LayerNorm32(name="norm1")(x)
        x = x + EditAttention(self.heads, is_cross=False, dtype=self.dtype, name="attn1")(
            h, edit_cfg=edit_cfg, edit_state=edit_state,
            block_index=block_index, place=place,
        )
        h = LayerNorm32(name="norm2")(x)
        x = x + EditAttention(self.heads, is_cross=True, dtype=self.dtype, name="attn2")(
            h, context, edit_cfg=edit_cfg, edit_state=edit_state,
            block_index=block_index, place=place, context_extra=context_extra,
            context_image=context_image,
        )
        h = LayerNorm32(name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN -> proj in -> depth x block -> proj out + skip.

    depth > 1 and use_linear (Dense projections instead of 1x1 convs) cover
    the SDXL-class configuration; SD-1.5 uses depth 1 with conv projections.
    """

    heads: int
    norm_num_groups: int = 32
    depth: int = 1
    use_linear: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x, context, *, edit_cfg, edit_state, block_index, place,
        context_extra=None, context_image=None,
    ):
        b, hh, ww, c = x.shape
        residual = x
        h = GroupNorm32(self.norm_num_groups, epsilon=1e-6, name="norm")(x)
        if self.use_linear:
            h = h.reshape(b, hh * ww, c)
            h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(b, hh * ww, c)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, dtype=self.dtype, name=f"transformer_blocks_{d}"
            )(
                h, context, edit_cfg=edit_cfg, edit_state=edit_state,
                block_index=block_index + d, place=place,
                context_extra=context_extra, context_image=context_image,
            )
        if self.use_linear:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hh, ww, c)
        else:
            h = h.reshape(b, hh, ww, c)
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual
