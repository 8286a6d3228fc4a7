"""CLIP ViT-L/14 text encoder in Flax (SD-1.5 conditioning model).

The reference gets text embeddings from diffusers' bundled
`CLIPTextModel` (`pipe.text_encoder`, used inside invert/sampling via
`self._encode_prompt`).  This is the same transformer re-expressed in Flax:
token + position embeddings, 12 pre-LN blocks with causal self-attention and
QuickGELU MLPs, final LayerNorm.  SD uses the *last hidden state* (not the
pooled projection), so that is what `__call__` returns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.config import CLIPTextConfig
from freefine_tpu.models.layers import LayerNorm32


class CLIPAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, causal_mask):
        b, s, e = x.shape
        d = e // self.heads
        q = nn.Dense(e, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(e, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(e, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            return t.reshape(b, s, self.heads, d).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q).astype(jnp.float32), split(k).astype(jnp.float32), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(jnp.float32(d))
        logits = logits + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, e)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)


class CLIPMLP(nn.Module):
    intermediate: int
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "quick_gelu"

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(x)
        if self.activation == "gelu":
            # exact (erf) GELU — the SD-2.x OpenCLIP-derived text tower
            h = jax.nn.gelu(h, approximate=False)
        else:
            # QuickGELU: x * sigmoid(1.702 x) — OpenAI CLIP / SD-1.5
            h = h * jax.nn.sigmoid(1.702 * h)
        return nn.Dense(dim, dtype=self.dtype, name="fc2")(h)


class CLIPEncoderLayer(nn.Module):
    heads: int
    intermediate: int
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "quick_gelu"

    @nn.compact
    def __call__(self, x, causal_mask):
        x = x + CLIPAttention(self.heads, self.dtype, name="self_attn")(
            LayerNorm32(name="layer_norm1")(x), causal_mask
        )
        x = x + CLIPMLP(self.intermediate, self.dtype, self.activation, name="mlp")(
            LayerNorm32(name="layer_norm2")(x)
        )
        return x


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, penultimate: bool = False
    ) -> jnp.ndarray:
        """[B, 77] int32 token ids -> [B, 77, hidden].

        Default: last hidden state after the final LayerNorm (SD-1.5).
        penultimate=True: hidden_states[-2] — skip the last layer and the
        final LayerNorm — the SDXL text_encoder convention
        (evaluation/DesignEdit/utils/sdxl.py encode_prompt)."""
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            dtype=cfg.dtype, name="token_embedding",
        )(input_ids)
        pos = nn.Embed(
            cfg.max_length, cfg.hidden_size,
            dtype=cfg.dtype, name="position_embedding",
        )(jnp.arange(s)[None, :])
        x = tok + pos
        causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
        n = cfg.num_layers - 1 if penultimate else cfg.num_layers
        for i in range(n):
            x = CLIPEncoderLayer(
                cfg.num_heads, cfg.intermediate_size, cfg.dtype,
                cfg.activation, name=f"layers_{i}",
            )(x, causal)
        if penultimate:
            return x
        return LayerNorm32(name="final_layer_norm")(x)
