"""BLIP backbone + ImageReward head in Flax — the IRS metric model.

The reference scores IRS with ImageReward-v1.0
(/root/reference/evaluation/metrics/image_reward.py:6-35), which is a BLIP
model: a ViT-L/16 image encoder and a BERT-base text encoder with
cross-attention to the image tokens, followed by a 5-layer MLP reward head
and a fixed score normalisation ((x - mean) / std with the released
constants).

Implemented here:
  * `BlipViT`   — pre-LN ViT-L/16 (1024-d, 24 layers) with cls token;
  * `BertCrossEncoder` — BERT-base layers with self-attention,
    cross-attention to the 1024-d image tokens, and GELU FFN;
  * `ImageReward` — text [CLS] feature -> MLP(1024,128,64,16,1) -> score;
  * a WordPiece tokenizer (loads bert vocab.txt; hash fallback).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from freefine_tpu.models.layers import LayerNorm32

# ImageReward-v1.0 released normalisation constants
IR_MEAN = 0.16717362830052426
IR_STD = 1.0333394966054072


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate: int = 3072
    vocab_size: int = 30524  # bert-base-uncased + BLIP special tokens
    max_text_len: int = 35
    dtype: jnp.dtype = jnp.float32


class ViTBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        d = c // self.heads
        h = LayerNorm32(1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0].astype(jnp.float32), qkv[1].astype(jnp.float32), qkv[2]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d))
        probs = jax.nn.softmax(logits, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(o.reshape(b, n, c))
        h = LayerNorm32(1e-6, name="norm2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(h)


class BlipViT(nn.Module):
    config: BlipConfig

    @nn.compact
    def __call__(self, x):
        """[B, 224, 224, 3] normalised -> [B, 1+N, 1024] image tokens."""
        cfg = self.config
        p = cfg.patch_size
        g = cfg.image_size // p
        b = x.shape[0]
        h = nn.Conv(
            cfg.vision_width, (p, p), strides=(p, p), padding="VALID",
            dtype=cfg.dtype, name="patch_embed",
        )(x.astype(cfg.dtype)).reshape(b, g * g, cfg.vision_width)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.vision_width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g + 1, cfg.vision_width))
        h = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(cfg.dtype), h], 1)
        h = h + pos.astype(cfg.dtype)
        for i in range(cfg.vision_layers):
            h = ViTBlock(cfg.vision_heads, cfg.dtype, name=f"blocks_{i}")(h)
        return LayerNorm32(1e-6, name="norm")(h)


class BertLayer(nn.Module):
    """BERT layer with optional cross-attention (BLIP med.py)."""

    heads: int
    intermediate: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, enc=None):
        b, s, c = x.shape
        d = c // self.heads

        def mha(q_in, kv_in, prefix):
            q = nn.Dense(c, dtype=self.dtype, name=f"{prefix}_query")(q_in)
            k = nn.Dense(c, dtype=self.dtype, name=f"{prefix}_key")(kv_in)
            v = nn.Dense(c, dtype=self.dtype, name=f"{prefix}_value")(kv_in)

            def split(t):
                return t.reshape(b, -1, self.heads, d).transpose(0, 2, 1, 3)

            qh, kh = split(q).astype(jnp.float32), split(k).astype(jnp.float32)
            vh = split(v)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
                jnp.float32(d)
            )
            if kv_in is q_in and attn_mask is not None:
                logits = logits + attn_mask[:, None, None, :]
            probs = jax.nn.softmax(logits, -1).astype(vh.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh).transpose(0, 2, 1, 3)
            return o.reshape(b, s, c)

        h = mha(x, x, "self")
        h = nn.Dense(c, dtype=self.dtype, name="self_output")(h)
        x = LayerNorm32(1e-12, name="self_ln")(x + h)

        if enc is not None:
            h = mha(x, enc, "cross")
            h = nn.Dense(c, dtype=self.dtype, name="cross_output")(h)
            x = LayerNorm32(1e-12, name="cross_ln")(x + h)

        h = nn.Dense(self.intermediate, dtype=self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="output")(h)
        return LayerNorm32(1e-12, name="output_ln")(x + h)


class BertCrossEncoder(nn.Module):
    config: BlipConfig

    @nn.compact
    def __call__(self, input_ids, attn_mask, image_tokens):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.text_width, dtype=cfg.dtype,
                       name="word_embeddings")(input_ids)
        pos = nn.Embed(512, cfg.text_width, dtype=cfg.dtype,
                       name="position_embeddings")(jnp.arange(s)[None])
        x = LayerNorm32(1e-12, name="emb_ln")(tok + pos)
        add_mask = (1.0 - attn_mask.astype(jnp.float32)) * -1e9
        for i in range(cfg.text_layers):
            x = BertLayer(
                cfg.text_heads, cfg.text_intermediate, cfg.dtype,
                name=f"layer_{i}",
            )(x, add_mask, enc=image_tokens)
        return x


class ImageReward(nn.Module):
    """score(prompt, image) — BLIP cross encoding + MLP head, normalised
    with the released constants (ImageReward-v1.0)."""

    config: BlipConfig

    def setup(self):
        self.visual_encoder = BlipViT(self.config, name="visual_encoder")
        self.text_encoder = BertCrossEncoder(self.config, name="text_encoder")
        dt = self.config.dtype
        self.mlp = [
            nn.Dense(1024, dtype=dt, name="mlp_0"),
            nn.Dense(128, dtype=dt, name="mlp_1"),
            nn.Dense(64, dtype=dt, name="mlp_2"),
            nn.Dense(16, dtype=dt, name="mlp_3"),
            nn.Dense(1, dtype=dt, name="mlp_4"),
        ]

    def __call__(self, images, input_ids, attn_mask):
        """images [B, 224, 224, 3] normalised; -> [B] normalised scores."""
        img_tokens = self.visual_encoder(images)
        txt = self.text_encoder(input_ids, attn_mask, img_tokens)
        h = txt[:, 0]
        for i, layer in enumerate(self.mlp):
            h = layer(h)
            if i < len(self.mlp) - 1:
                h = nn.relu(h)
        score = h[:, 0].astype(jnp.float32)
        return (score - IR_MEAN) / IR_STD


BLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
BLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def preprocess_blip(img_uint8: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """On-device convenience preprocess (jax bicubic = Keys a=-0.5, NOT the
    PIL kernel).  Metric scoring must NOT use this: the reference-exact
    IRS chain is `metrics.preprocess.clip_image_transform` (PIL-backed,
    what `make_irs_scorer` uses); this helper only serves
    device-resident demos where a ~1e-2 resample difference is fine."""
    x = img_uint8.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (size, size, 3), method="bicubic")
    return ((x - BLIP_MEAN) / BLIP_STD)[None]


class WordPieceTokenizer:
    """BERT WordPiece (loads vocab.txt); greedy longest-match-first."""

    def __init__(self, vocab: dict, max_len: int = 35):
        self.vocab = vocab
        self.max_len = max_len
        self.cls = vocab.get("[CLS]", 101)
        self.sep = vocab.get("[SEP]", 102)
        self.pad = vocab.get("[PAD]", 0)
        self.unk = vocab.get("[UNK]", 100)

    @classmethod
    def from_vocab_file(cls, path: str, max_len: int = 35):
        with open(path, encoding="utf-8") as f:
            vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        return cls(vocab, max_len)

    def _wordpiece(self, word: str) -> List[int]:
        ids, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str):
        import re

        words = re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower())
        ids = [self.cls]
        for w in words:
            ids.extend(self._wordpiece(w))
        ids = ids[: self.max_len - 1] + [self.sep]
        mask = [1] * len(ids) + [0] * (self.max_len - len(ids))
        ids = ids + [self.pad] * (self.max_len - len(ids))
        return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


class HashWordTokenizer:
    """Deterministic fallback when no vocab.txt is available."""

    def __init__(self, vocab_size: int = 30524, max_len: int = 35):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def encode(self, text: str):
        words = text.lower().split()
        ids = [101]
        for w in words:
            h = 2166136261
            for ch in w.encode():
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            ids.append(103 + h % (self.vocab_size - 200))
        ids = ids[: self.max_len - 1] + [102]
        mask = [1] * len(ids) + [0] * (self.max_len - len(ids))
        ids = ids + [0] * (self.max_len - len(ids))
        return np.asarray(ids, np.int32), np.asarray(mask, np.int32)
