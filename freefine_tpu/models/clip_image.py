"""CLIP image tower (ViT-B/32) in Flax — the BGC metric encoder.

The reference scores background consistency with OpenAI CLIP ViT-B/32
image features (evaluation/metrics/VBench/background_consistency.py:18-49).
Same transformer stack as the text encoder (pre-LN, QuickGELU) with a conv
patch stem, class embedding, ln_pre/ln_post and the visual projection.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.models.layers import LayerNorm32
from freefine_tpu.models.text_encoder import CLIPEncoderLayer


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    projection_dim: int = 512
    # OpenAI CLIP towers (B/32 BGC encoder) use QuickGELU; OpenCLIP-trained
    # towers (laion2B ViT-H/14, the HPSv2.1 backbone) use exact GELU.
    activation: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32


def clip_vit_b32() -> CLIPVisionConfig:
    return CLIPVisionConfig()


def clip_vit_h14() -> CLIPVisionConfig:
    """OpenCLIP ViT-H/14 (the HPSv2.1 backbone,
    evaluation/metrics/human_preference_score.py:8-83).  open_clip's
    ViT-H-14 model card has no `quick_gelu` flag, so its MLPs are exact
    GELU — unlike the OpenAI-checkpoint towers."""
    return CLIPVisionConfig(
        patch_size=14, hidden_size=1280, intermediate_size=5120,
        num_layers=32, num_heads=16, projection_dim=1024,
        activation="gelu",
    )


CLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
CLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def preprocess_clip(img_uint8: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """uint8 RGB [H, W, 3] -> [1, size, size, 3], bicubic resize of the
    short side + center crop + CLIP normalisation (clip.load preprocess).

    On-device convenience path: jax bicubic (Keys a=-0.5) approximates
    PIL's kernel to ~1e-2.  Metric scoring must NOT use this — the
    reference-exact chain is `metrics.preprocess.clip_image_transform`
    (PIL-backed; what make_clip_encoder / make_hps_encoders use)."""
    x = img_uint8.astype(jnp.float32) / 255.0
    h, w = x.shape[:2]
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(x, (nh, nw, 3), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = jax.lax.dynamic_slice(x, (top, left, 0), (size, size, 3))
    return ((x - CLIP_MEAN) / CLIP_STD)[None]


class CLIPImageEncoder(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, penultimate: bool = False
    ) -> jnp.ndarray:
        """[B, S, S, 3] preprocessed -> [B, projection_dim] image features.

        With `penultimate=True` returns the full token sequence after the
        second-to-last layer instead (HF `hidden_states[-2]`, no final
        layernorm) — the IP-Adapter-plus image conditioning input
        (RegionDrag/region_utils/drag.py:121-132)."""
        cfg = self.config
        b = x.shape[0]
        p = cfg.patch_size
        g = cfg.image_size // p
        h = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
            use_bias=False, dtype=cfg.dtype, name="patch_embedding",
        )(x.astype(cfg.dtype))
        h = h.reshape(b, g * g, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        h = jnp.concatenate(
            [jnp.tile(cls[None, None], (b, 1, 1)).astype(cfg.dtype), h], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (g * g + 1, cfg.hidden_size),
        )
        h = h + pos[None].astype(cfg.dtype)
        h = LayerNorm32(name="pre_layrnorm")(h)
        zero_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
        h_penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                h_penultimate = h
            h = CLIPEncoderLayer(
                cfg.num_heads, cfg.intermediate_size, cfg.dtype,
                cfg.activation, name=f"layers_{i}",
            )(h, zero_mask)
        if penultimate:
            return h_penultimate
        pooled = LayerNorm32(name="post_layernorm")(h[:, 0])
        proj = self.param(
            "visual_projection",
            nn.initializers.normal(0.02),
            (cfg.hidden_size, cfg.projection_dim),
        )
        return pooled @ proj.astype(pooled.dtype)
