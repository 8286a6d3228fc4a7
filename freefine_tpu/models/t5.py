"""T5 v1.1 text encoder — the PixArt caption tower.

PixArt-α conditions on T5-XXL (google/t5-v1_1-xxl) encoder states
(4096-d), not CLIP; this module provides the Flax encoder so the PixArt
DiT lane is checkpoint-complete (tokenize → T5 → caption_projection →
transformer).  Architecture (HF `T5EncoderModel`, feed_forward_proj
"gated-gelu"):

  * shared token embedding; NO absolute positions — a learned relative
    position bias ([num_buckets, heads], block 0 only, shared by all
    blocks) added to the attention logits
  * pre-RMSNorm blocks: self-attention (q/k/v/o, no biases, and NO
    1/sqrt(d) scaling — T5 folds it into init) + gated-GELU FF
    (wi_0 ⊙ gelu, wi_1 linear, wo out)
  * final RMSNorm

Torch parity: tests/test_hf_parity.py pins this against the in-env
transformers T5EncoderModel at tiny scale through the state-dict
converter (weights.convert_t5_encoder).

TPU notes: the relative bias table is gathered once per forward into a
static [heads, S, S] bias (S = 120 tokens for PixArt) — tiny next to the
4096-d matmuls, which are pure MXU work.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096       # t5-v1_1-xxl
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    max_length: int = 120     # the PixArt pipeline's caption length
    dtype: jnp.dtype = jnp.bfloat16


def tiny_t5_config() -> T5Config:
    return T5Config(
        vocab_size=100, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, max_length=16, dtype=jnp.float32,
    )


def _relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional bucket mapping (HF T5Attention._relative_position_bucket
    with bidirectional=True) — static, computed host-side once."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


class RMSNorm(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        return (w * x32 / jnp.sqrt(var + self.epsilon)).astype(dtype)


class T5SelfAttention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, key_mask):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        b, s, _ = x.shape
        dense = lambda name: nn.Dense(
            inner, use_bias=False, dtype=c.dtype, name=name
        )
        split = lambda t: t.reshape(b, s, c.num_heads, c.d_kv).transpose(
            0, 2, 1, 3
        )
        q, k, v = split(dense("q")(x)), split(dense("k")(x)), split(
            dense("v")(x)
        )
        # T5: no 1/sqrt(d) scaling
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits + pos_bias[None]
        if key_mask is not None:
            logits = logits + (key_mask[:, None, None, :] - 1.0) * 1e9
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(
            x.shape[-1], use_bias=False, dtype=c.dtype, name="o"
        )(out)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, key_mask):
        c = self.cfg
        h = RMSNorm(c.layer_norm_epsilon, name="norm_attn")(x)
        x = x + T5SelfAttention(c, name="attn")(h, pos_bias, key_mask)
        h = RMSNorm(c.layer_norm_epsilon, name="norm_ff")(x)
        # gated-gelu (v1.1): wi_0 -> gelu_new, gated by wi_1
        g = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_0")(h)
        u = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_1")(h)
        h = nn.gelu(g, approximate=True) * u
        x = x + nn.Dense(
            c.d_model, use_bias=False, dtype=c.dtype, name="wo"
        )(h)
        return x


class T5Encoder(nn.Module):
    """`T5EncoderModel.encoder` — returns last_hidden_state [B, S, d]."""

    config: T5Config

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,                  # [B, S] int32
        attention_mask: Optional[jnp.ndarray] = None,  # [B, S] 1 = keep
    ) -> jnp.ndarray:
        c = self.config
        emb = self.param(
            "shared", nn.initializers.normal(1.0),
            (c.vocab_size, c.d_model), jnp.float32,
        )
        x = jnp.asarray(emb, c.dtype)[input_ids]

        s = input_ids.shape[1]
        rel = np.arange(s)[None, :] - np.arange(s)[:, None]  # key - query
        buckets = _relative_position_bucket(
            rel, c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )
        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (c.relative_attention_num_buckets, c.num_heads), jnp.float32,
        )
        pos_bias = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)

        key_mask = (
            None if attention_mask is None
            else attention_mask.astype(jnp.float32)
        )
        for i in range(c.num_layers):
            x = T5Block(c, name=f"block_{i}")(x, pos_bias, key_mask)
        return RMSNorm(
            c.layer_norm_epsilon, name="final_layer_norm"
        )(x).astype(jnp.float32)
