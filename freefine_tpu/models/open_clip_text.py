"""OpenCLIP text tower (ViT-H-14 / laion2B) in Flax — the HPSv2.1 backbone.

The reference scores HPS with HPSv2.1, an OpenCLIP ViT-H-14 fine-tune
(evaluation/metrics/human_preference_score.py:8-83).  OpenCLIP's text
transformer differs from the HF CLIP one in two ways that matter for weight
parity: plain GELU (not QuickGELU) and features taken at the EOT token
(argmax of token ids) followed by a text projection matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.models.layers import LayerNorm32


@dataclasses.dataclass(frozen=True)
class OpenCLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    projection_dim: int = 1024
    dtype: jnp.dtype = jnp.float32


def open_clip_text_h14() -> OpenCLIPTextConfig:
    return OpenCLIPTextConfig()


def open_clip_text_bigg(dtype=jnp.float32) -> OpenCLIPTextConfig:
    """OpenCLIP ViT-bigG-14 text tower — SDXL's text_encoder_2."""
    return OpenCLIPTextConfig(
        width=1280, heads=20, layers=32, projection_dim=1280, dtype=dtype
    )


class Block(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal):
        b, s, c = x.shape
        d = c // self.heads
        h = LayerNorm32(name="ln_1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        qh, kh = split(q).astype(jnp.float32), split(k).astype(jnp.float32)
        vh = split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(jnp.float32(d))
        probs = jax.nn.softmax(logits + causal, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh).transpose(0, 2, 1, 3)
        x = x + nn.Dense(c, dtype=self.dtype, name="out_proj")(o.reshape(b, s, c))
        h = LayerNorm32(name="ln_2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c, dtype=self.dtype, name="mlp_proj")(h)


class OpenCLIPText(nn.Module):
    config: OpenCLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """[B, 77] int32 -> [B, projection_dim] text features (unnormalised)."""
        cfg = self.config
        b, s = input_ids.shape
        x = nn.Embed(
            cfg.vocab_size, cfg.width, dtype=cfg.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = x + pos[None, :s].astype(cfg.dtype)
        causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
        for i in range(cfg.layers):
            x = Block(cfg.heads, cfg.dtype, name=f"resblocks_{i}")(x, causal)
        x = LayerNorm32(name="ln_final")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.01),
            (cfg.width, cfg.projection_dim),
        )
        return pooled @ proj.astype(pooled.dtype)


class OpenCLIPTextHidden(nn.Module):
    """SDXL `text_encoder_2` head: penultimate hidden states + pooled
    projection.

    SDXL conditions the UNet on hidden_states[-2] of BOTH text towers
    (concatenated to 2048-d) and additionally on this tower's pooled
    projection (evaluation/DesignEdit/utils/sdxl.py encode_prompt).  The EOT
    position is passed explicitly (not argmax of ids) so stand-in tokenizers
    with small vocabularies pool correctly.
    """

    config: OpenCLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, eot_pos: jnp.ndarray):
        """([B, 77] int32, [B] int32) -> ([B, 77, width], [B, projection])."""
        cfg = self.config
        b, s = input_ids.shape
        x = nn.Embed(
            cfg.vocab_size, cfg.width, dtype=cfg.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = x + pos[None, :s].astype(cfg.dtype)
        causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
        hidden_pen = None
        for i in range(cfg.layers):
            if i == cfg.layers - 1:
                hidden_pen = x
            x = Block(cfg.heads, cfg.dtype, name=f"resblocks_{i}")(x, causal)
        x = LayerNorm32(name="ln_final")(x)
        pooled = x[jnp.arange(b), eot_pos]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.01),
            (cfg.width, cfg.projection_dim),
        )
        return hidden_pen, pooled @ proj.astype(pooled.dtype)
