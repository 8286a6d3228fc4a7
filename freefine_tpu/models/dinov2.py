"""DINOv2 ViT in Flax (patch 14), NHWC.

The reference vendors facebookresearch/dinov2 as a torch.hub module
(/root/reference/torchhub/facebookresearch_dinov2_main/, loaded at
depth_anything/dpt.py:147) and uses it two ways:

  * Depth-Anything backbone: `get_intermediate_layers(x, 4,
    return_class_token=True)` — last-4-block outputs, final-norm applied;
  * metric encoders (FID_DINO / SUBC use DINO features).

Implemented: patch embed (14x14 conv), cls token, bicubically interpolated
position embeddings for arbitrary grids, pre-LN blocks with fused-qkv
attention + LayerScale, final LN.  bf16-friendly: norms/softmax in f32.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.models.layers import LayerNorm32
from freefine_tpu.ops.resize import interpolate_bicubic


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch_size: int = 14
    mlp_ratio: int = 4
    pos_embed_size: int = 37  # 518 / 14 grid used by the pretrained models
    dtype: jnp.dtype = jnp.float32


def dinov2_vits14() -> DINOv2Config:
    return DINOv2Config(dim=384, depth=12, heads=6)


def dinov2_vitb14() -> DINOv2Config:
    return DINOv2Config(dim=768, depth=12, heads=12)


def dinov2_vitl14() -> DINOv2Config:
    return DINOv2Config(dim=1024, depth=24, heads=16)


class Attention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        d = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0].astype(jnp.float32), qkv[1].astype(jnp.float32), qkv[2]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d))
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return x * gamma


class Block(nn.Module):
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = LayerNorm32(1e-6, name="norm1")(x)
        h = Attention(self.heads, self.dtype, name="attn")(h)
        x = x + LayerScale(c, name="ls1")(h)
        h = LayerNorm32(1e-6, name="norm2")(x)
        h = nn.Dense(c * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(h)
        return x + LayerScale(c, name="ls2")(h)


class DINOv2(nn.Module):
    config: DINOv2Config

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, num_intermediate: int = 0
    ):
        """x: [B, H, W, 3] with H, W multiples of patch_size.

        num_intermediate == 0: returns (patch_tokens, cls) of the final
        normed output.  Otherwise returns a list of the last
        `num_intermediate` blocks' (patch_tokens, cls), each final-normed —
        dinov2 `get_intermediate_layers(..., norm=True)`.
        """
        cfg = self.config
        b, h, w, _ = x.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p

        tokens = nn.Conv(
            cfg.dim, (p, p), strides=(p, p), padding="VALID",
            dtype=cfg.dtype, name="patch_embed",
        )(x.astype(cfg.dtype))
        tokens = tokens.reshape(b, gh * gw, cfg.dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.dim)
        ).astype(cfg.dtype)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.pos_embed_size ** 2 + 1, cfg.dim),
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (cfg.pos_embed_size, cfg.pos_embed_size):
            g = cfg.pos_embed_size
            grid = patch_pos.reshape(1, g, g, cfg.dim)
            # torch-convention bicubic (interpolate_pos_encoding uses
            # F.interpolate's A=-0.75 kernel, not jax's a=-0.5; identity
            # at the native 37x37 grid, so the hf-parity test could not
            # see it)
            grid = interpolate_bicubic(grid, (gh, gw))
            patch_pos = grid.reshape(1, gh * gw, cfg.dim)
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), tokens], axis=1)
        x = x + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(cfg.dtype)

        norm = LayerNorm32(1e-6, name="norm")
        outputs: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        take_from = cfg.depth - max(num_intermediate, 0)
        for i in range(cfg.depth):
            x = Block(cfg.heads, cfg.mlp_ratio, cfg.dtype, name=f"blocks_{i}")(x)
            if num_intermediate and i >= take_from:
                y = norm(x)
                outputs.append((y[:, 1:], y[:, 0]))
        if num_intermediate:
            return outputs
        y = norm(x)
        return y[:, 1:], y[:, 0]
