"""SD UNet2DCondition in Flax with first-class editing hooks.

Structure matches diffusers' SD-1.5 UNet (the backbone the reference loads,
/root/reference/src/demo/model.py:94) in NHWC layout.  Differences from a
plain port, by design:

  * Editing behaviour is an input — ``(EditConfig, EditState)`` — not
    monkey-patched forwards (reference `register_attention_control`,
    src/utils/attention.py:342-452).  Each (mode, method) pair compiles to
    its own fused XLA graph.
  * Transformer blocks carry a static ``block_index`` in execution order
    (down 0-5, mid 6, up 7-15 for SD-1.5), the functional equivalent of the
    reference's runtime `cur_att_layer // 2` counter (attention.py:1051).
  * The mid-block feature replacement (``h_sample``) and up-block feature
    collection of the reference's `override_forward`
    (src/utils/attention.py:11-225) are supported as explicit arguments /
    outputs (used for DIFT features and energy guidance).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.config import UNetConfig
from freefine_tpu.edit import EditConfig, EditState, none_config
from freefine_tpu.models.layers import (
    Downsample,
    GroupNorm32,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbed,
    Upsample,
)


class UNet2DCondition(nn.Module):
    """SD-1.5 conditional UNet with edit-state routing.

    Call signature:
      sample  [B, H, W, C_in]  latent batch (streams layout per EditConfig)
      timestep scalar or [B]
      encoder_hidden_states [B, 77, D_text]
      context_extra optional [P, 77, D_text] compose region prompts
      h_sample optional mid-block replacement [2 or B, h, w, 1280]
      return_features: also return the mid + up block hidden states
    """

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        *,
        edit_cfg: EditConfig = none_config(),
        edit_state: Optional[EditState] = None,
        context_extra: Optional[jnp.ndarray] = None,
        h_sample: Optional[jnp.ndarray] = None,
        added_cond: Optional[jnp.ndarray] = None,
        context_image: Optional[jnp.ndarray] = None,
        return_features: bool = False,
    ):
        cfg = self.config
        dtype = cfg.dtype
        sample = sample.astype(dtype)
        context = encoder_hidden_states.astype(dtype)
        if context_extra is not None:
            context_extra = context_extra.astype(dtype)

        timestep = jnp.asarray(timestep)
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))
        temb = TimestepEmbed(
            base_dim=cfg.block_out_channels[0],
            embed_dim=cfg.block_out_channels[0] * 4,
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            freq_shift=cfg.freq_shift,
            dtype=dtype,
            name="time_embedding",
        )(timestep)
        if cfg.addition_embed_dim is not None:
            assert added_cond is not None, (
                "this config needs SDXL-style added conditioning "
                "(projected text_embeds ++ time_ids)"
            )
            a = nn.Dense(
                cfg.block_out_channels[0] * 4, dtype=dtype, name="add_embedding_1"
            )(added_cond.astype(dtype))
            a = nn.silu(a)
            a = nn.Dense(
                cfg.block_out_channels[0] * 4, dtype=dtype, name="add_embedding_2"
            )(a)
            temb = temb + a

        num_blocks = len(cfg.block_out_channels)
        attn_index = 0  # transformer-block counter in execution order

        use_linear = cfg.use_linear_projection

        def make_transformer(name, level):
            # diffusers per-level head counts: SDXL/SD-2.x fix head_dim=64
            # (heads = channels // 64 at each level); SD-1.5 fixes the head
            # COUNT at 8 everywhere.  Same weight shapes, different softmax
            # grouping — real-checkpoint parity depends on this.
            heads = (
                cfg.block_out_channels[level] // cfg.head_dim
                if cfg.head_dim is not None
                else cfg.num_attention_heads
            )
            return SpatialTransformer(
                heads=heads,
                norm_num_groups=cfg.norm_num_groups,
                depth=cfg.transformer_depth[level],
                use_linear=use_linear,
                dtype=dtype,
                name=name,
            )

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), dtype=dtype, name="conv_in")(
            sample
        )

        # ----- down -----
        skips = [h]
        for i, out_ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.down_block_has_attn[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    out_ch, cfg.norm_num_groups, dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(h, temb)
                if has_attn:
                    h = make_transformer(f"down_blocks_{i}_attentions_{j}", i)(
                        h, context,
                        edit_cfg=edit_cfg, edit_state=edit_state,
                        block_index=attn_index, place="down",
                        context_extra=context_extra, context_image=context_image,
                    )
                    attn_index += cfg.transformer_depth[i]
                skips.append(h)
            if i < num_blocks - 1:
                h = Downsample(out_ch, dtype, name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)

        # ----- mid -----
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock(mid_ch, cfg.norm_num_groups, dtype, name="mid_block_resnets_0")(
            h, temb
        )
        h = make_transformer("mid_block_attentions_0", num_blocks - 1)(
            h, context,
            edit_cfg=edit_cfg, edit_state=edit_state,
            block_index=attn_index, place="mid", context_extra=context_extra,
            context_image=context_image,
        )
        attn_index += cfg.transformer_depth[num_blocks - 1]
        h = ResnetBlock(mid_ch, cfg.norm_num_groups, dtype, name="mid_block_resnets_1")(
            h, temb
        )

        # Mid-feature replacement: edit streams only for the 4-stream layout
        # (reference src/utils/attention.py:159-165).
        if h_sample is not None:
            if sample.shape[0] == 4 and h_sample.shape[0] == 2:
                h = jnp.stack([h_sample[0], h[1], h_sample[1], h[3]])
            elif sample.shape[0] == 3 and h_sample.shape[0] == 2:
                # deduped edit layout [u_e, r, c_e]: replace both edit streams
                h = jnp.stack([h_sample[0], h[1], h_sample[1]])
            else:
                h = h_sample.astype(h.dtype)

        features = [h]

        # ----- up -----
        # Channels run deepest-first; `up_block_has_attn` is already declared
        # in up-block order (SD-1.5: up_blocks[0] is the plain 1280-ch block,
        # attention lives in up_blocks 1..3 — diffusers up_block_types).
        rev_ch = list(reversed(cfg.block_out_channels))
        for i in range(num_blocks):
            out_ch = rev_ch[i]
            has_attn = cfg.up_block_has_attn[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(
                    out_ch, cfg.norm_num_groups, dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(h, temb)
                if (
                    edit_cfg.sow_token_attn
                    and i == num_blocks - 1
                    and j == cfg.layers_per_block - 1
                ):
                    # SelfGuidance appearance-feature tap: the reference
                    # hooks up_blocks[-1].resnets[-2]'s output
                    # (free_guidance.py:595-599)
                    self.sow("intermediates", "guidance_feature", h)
                if has_attn:
                    level = num_blocks - 1 - i
                    h = make_transformer(f"up_blocks_{i}_attentions_{j}", level)(
                        h, context,
                        edit_cfg=edit_cfg, edit_state=edit_state,
                        block_index=attn_index, place="up",
                        context_extra=context_extra, context_image=context_image,
                    )
                    attn_index += cfg.transformer_depth[level]
            if i < num_blocks - 1:
                h = Upsample(out_ch, dtype, name=f"up_blocks_{i}_upsamplers_0")(h)
            features.append(h)

        # ----- out -----
        h = GroupNorm32(cfg.norm_num_groups, name="conv_norm_out")(h, silu=True)
        h = nn.Conv(cfg.out_channels, (3, 3), dtype=dtype, name="conv_out")(h)

        if return_features:
            return h, features
        return h
