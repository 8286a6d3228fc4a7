"""DiT editing backbone — the reference README's named backbone-swap TODO.

The reference plans an "SDXL/DiT backbone swap" (/root/reference/README.md
TODO; SURVEY.md §5 "Long-context").  SDXL landed earlier this round; this
module adds the DiT half: a PixArt-α-class latent diffusion transformer
(patchify → AdaLN-single modulated blocks of self-attn + cross-attn + FF →
unpatchify) whose attention layers are the SAME `EditAttention` stack the
UNet uses — so every FreeFine editing mechanism (TCA reference K/V
injection, masked local CFG, DesignEdit key masking, attention sowing)
works on a pure-transformer backbone with zero pipeline changes: the model
satisfies the `unet_apply(params, lat, t, ctx, ecfg, state)` contract of
`pipeline.sample_edit_loop`.

TPU notes: a DiT is the MXU-friendliest backbone of the family — one token
grid (S = (latent/patch)², e.g. 1024 at 512²), head_dim 64/72 (vs the SD
UNet's pad-heavy d=40 at 64²), no GroupNorm/conv interleave, so the whole
block is dense matmuls XLA tiles directly.  The editing mask pyramid
already carries the DiT token resolution (32² for 512² images).

Block gating: a DiT has no down/mid/up split; all blocks report
``place="up"`` so the default ``tca_scope=("up",)`` applies, and the
reference's decoder-layer window (`start_layer=10` of 16, model.py:506)
maps onto ``EditConfig.layer_range`` over the block list.

Layout is PixArt-α-exact (diffusers `PixArtTransformer2DModel`, and the
checkpoint converter `weights.convert_pixart_transformer`): tanh-GELU MLP
feed-forward, biased q/k/v projections, AdaLN-single (shared 6·D timestep
table + per-block `scale_shift_table`), final modulation from the RAW
embedded timestep + top-level `scale_shift_table`, and the diffusers
`get_2d_sincos_pos_embed` position table (x-coordinate sincos in the first
half of the channel dim).  `pixart_xl2_dit_config()` is the published
PixArt-XL-2-512x512 geometry (T5 4096-d captions); `dit_pipeline_config()`
keeps the CLIP 768-d context for the self-contained editing lane (identical
architecture, different caption width).  Not modelled: the 1024 model's
resolution/aspect-ratio micro-conditioning embedders
(`use_additional_conditions`; the 512 checkpoint does not use them).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from freefine_tpu.config import DiTConfig
from freefine_tpu.edit import EditConfig, EditState, none_config
from freefine_tpu.models.layers import (
    EditAttention,
    TimestepEmbed,
)


def _sincos_2d(embed_dim: int, grid: int) -> np.ndarray:
    """Fixed 2-D sin-cos position table [grid*grid, embed_dim].

    Matches diffusers `get_2d_sincos_pos_embed` (embeddings.py) for the
    square PixArt grids (base_size = grid, interpolation_scale = 1): tokens
    flattened row-major; the FIRST embed_dim/2 channels encode the x
    (column) coordinate, the second half the y (row) coordinate — diffusers
    meshgrids (w, h) and labels grid[0] "h", so its `emb_h` is actually the
    column sincos.
    """
    pos = np.arange(grid, dtype=np.float64)
    omega = 1.0 / 10000 ** (np.arange(embed_dim // 4) / (embed_dim / 4.0))
    out = np.einsum("p,d->pd", pos, omega)           # [grid, D/4]
    emb1 = np.concatenate([np.sin(out), np.cos(out)], axis=1)  # [grid, D/2]
    y = np.repeat(emb1, grid, axis=0)                # row coordinate
    x = np.tile(emb1, (grid, 1))                     # column coordinate
    return np.concatenate([x, y], axis=1)            # [grid², D]


def _ln(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Affine-free LayerNorm in f32 (AdaLN supplies scale/shift)."""
    out = nn.LayerNorm(
        epsilon=1e-6, use_scale=False, use_bias=False,
        dtype=jnp.float32, name=name,
    )(x.astype(jnp.float32))
    return out.astype(x.dtype)


class DiTBlock(nn.Module):
    """AdaLN-single block: gated self-attn, plain cross-attn, gated FF."""

    heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x, context, t6, *, edit_cfg, edit_state, block_index,
        context_extra=None, context_image=None,
    ):
        dim = x.shape[-1]
        # PixArt adaLN-single: shared 6·D timestep table + per-block learned
        # offsets (scale_shift_table), chunked into shift/scale/gate pairs.
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(dim ** -0.5),
            (6, dim), jnp.float32,
        )
        mod = (table[None] + t6.astype(jnp.float32)).astype(x.dtype)
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = [mod[:, i:i + 1] for i in range(6)]
        h = _ln(x, "norm1") * (1 + scale_msa) + shift_msa
        x = x + gate_msa * EditAttention(
            self.heads, is_cross=False, dtype=self.dtype, qkv_bias=True,
            name="attn1",
        )(h, edit_cfg=edit_cfg, edit_state=edit_state,
          block_index=block_index, place="up")
        # PixArt applies cross-attention on the un-normed stream ("for
        # PixArt norm2 isn't applied here", diffusers BasicTransformerBlock)
        x = x + EditAttention(
            self.heads, is_cross=True, dtype=self.dtype, qkv_bias=True,
            name="attn2",
        )(x, context, edit_cfg=edit_cfg, edit_state=edit_state,
          block_index=block_index, place="up",
          context_extra=context_extra, context_image=context_image)
        h = _ln(x, "norm2") * (1 + scale_mlp) + shift_mlp
        # PixArt FF: Dense(4D) -> tanh-GELU -> Dense(D)
        # (diffusers FeedForward activation_fn="gelu-approximate")
        dim_ff = 4 * dim
        h = nn.Dense(dim_ff, dtype=self.dtype, name="ff_net_0_proj")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(dim, dtype=self.dtype, name="ff_net_2")(h)
        x = x + gate_mlp * h
        return x


class DiT2DCondition(nn.Module):
    """Text-conditioned latent DiT with first-class editing hooks.

    Call signature matches `UNet2DCondition` so the pipeline loops accept
    either backbone unchanged.
    """

    config: DiTConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                 # [B, H, W, C] latents (NHWC)
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,  # [B, L, ctx_dim]
        *,
        edit_cfg: EditConfig = none_config(),
        edit_state: Optional[EditState] = None,
        context_extra: Optional[jnp.ndarray] = None,
        context_image: Optional[jnp.ndarray] = None,
        added_cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        assert added_cond is None, "DiT backbone has no added conditioning"
        cfg = self.config
        dtype = cfg.dtype
        b, hh, ww, c = sample.shape
        p = cfg.patch_size
        assert hh == ww == cfg.sample_size and hh % p == 0, sample.shape
        grid = hh // p

        x = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), dtype=dtype,
            name="patch_embed",
        )(sample.astype(dtype))
        x = x.reshape(b, grid * grid, cfg.hidden_size)
        x = x + jnp.asarray(
            _sincos_2d(cfg.hidden_size, grid), dtype
        )[None]

        timestep = jnp.asarray(timestep)
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep, (b,))
        temb = TimestepEmbed(
            base_dim=256, embed_dim=cfg.hidden_size, dtype=dtype,
            name="time_embedding",
        )(timestep)
        t6 = nn.Dense(6 * cfg.hidden_size, dtype=dtype, name="t_block")(
            nn.silu(temb)
        ).reshape(b, 6, cfg.hidden_size)

        cp1 = nn.Dense(cfg.hidden_size, dtype=dtype, name="caption_proj_1")
        cp2 = nn.Dense(cfg.hidden_size, dtype=dtype, name="caption_proj_2")

        def caption(z):
            return cp2(nn.gelu(cp1(z.astype(dtype)), approximate=True))

        ctx = caption(encoder_hidden_states)
        if context_extra is not None:
            # the per-region prompt stack (compose local cross-attn) rides
            # the same caption projection as the primary prompt
            context_extra = caption(context_extra)
        for i in range(cfg.depth):
            x = DiTBlock(
                heads=cfg.num_heads, dtype=dtype, name=f"blocks_{i}"
            )(x, ctx, t6, edit_cfg=edit_cfg, edit_state=edit_state,
              block_index=i, context_extra=context_extra,
              context_image=context_image)

        # PixArt final modulation: top-level scale_shift_table + the RAW
        # embedded timestep (no learned projection) — diffusers
        # PixArtTransformer2DModel.forward's `scale_shift_table[None] +
        # embedded_timestep[:, None]`, chunked [shift, scale].
        final = self.param(
            "scale_shift_table",
            nn.initializers.normal(cfg.hidden_size ** -0.5),
            (2, cfg.hidden_size), jnp.float32,
        )
        fmod = (
            final[None] + temb[:, None].astype(jnp.float32)
        ).astype(dtype)
        x = _ln(x, "norm_final") * (1 + fmod[:, 1:2]) + fmod[:, 0:1]
        # learn_sigma (PixArt checkpoints): the projection emits
        # [eps; sigma] and the pipeline consumes the eps half (the diffusers
        # PixArt pipeline's latent-channel chunk).
        out_c = cfg.out_channels * (2 if cfg.learn_sigma else 1)
        x = nn.Dense(
            p * p * out_c, dtype=dtype, name="proj_out"
        )(x)
        x = x.reshape(b, grid, grid, p, p, out_c)
        x = jnp.einsum("bhwpqc->bhpwqc", x).reshape(b, hh, ww, out_c)
        return x[..., : cfg.out_channels].astype(jnp.float32)
