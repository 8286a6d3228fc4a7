"""EfficientSAM (ViT-T/S) in Flax, NHWC — interactive mask extraction.

Reimplements the reference's vendored EfficientSAM
(/root/reference/sam/efficient_sam/): ViT image encoder with conv neck
(efficient_sam_encoder.py:179-257), random-frequency point prompt encoder
(efficient_sam_decoder.py:17-137), two-way transformer mask decoder
(two_way_transformer.py + efficient_sam_decoder.py:139-315), and the
top-level predict path with point rescaling, IoU sorting and bicubic mask
upsampling (efficient_sam.py:57-226).

Used by the Gradio frontend for click/box-prompted segmentation
(src/demo/utils.py:40-100) and available for on-device batched mask
extraction.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.models.layers import LayerNorm32
from freefine_tpu.ops.resize import interpolate_bicubic


@dataclasses.dataclass(frozen=True)
class EfficientSAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    patch_embed_dim: int = 384      # vits; vitt: 192
    depth: int = 12
    num_heads: int = 6              # vits; vitt: 3
    mlp_ratio: float = 4.0
    neck_dim: int = 256
    decoder_max_points: int = 6
    decoder_depth: int = 2
    decoder_mlp_dim: int = 2048
    decoder_heads: int = 8
    num_multimask_outputs: int = 3
    upscaling_dims: Tuple[int, ...] = (64, 32)
    iou_hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32


def efficient_sam_vits() -> EfficientSAMConfig:
    return EfficientSAMConfig(patch_embed_dim=384, num_heads=6)


def efficient_sam_vitt() -> EfficientSAMConfig:
    return EfficientSAMConfig(patch_embed_dim=192, num_heads=3)


class ViTBlock(nn.Module):
    heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        d = c // self.heads
        h = LayerNorm32(1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="attn_qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0].astype(jnp.float32), qkv[1].astype(jnp.float32), qkv[2]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d))
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
        x = x + nn.Dense(c, dtype=self.dtype, name="attn_proj")(o.reshape(b, n, c))
        h = LayerNorm32(1e-6, name="norm2")(x)
        h = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class LayerNorm2d(nn.Module):
    """Channel layer-norm over NHWC features (encoder neck)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        out = (xf - mu) / jnp.sqrt(var + 1e-6)
        return (out * w + b).astype(x.dtype)


class ImageEncoder(nn.Module):
    config: EfficientSAMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        p = cfg.patch_size
        gh = cfg.img_size // p
        x = nn.Conv(
            cfg.patch_embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=cfg.dtype, name="patch_embed",
        )(x.astype(cfg.dtype))
        b = x.shape[0]

        # pretrain 224/16 = 14x14 grid + cls (efficient_sam_encoder.py:213-217)
        num_pos = (224 // p) ** 2 + 1
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, num_pos, cfg.patch_embed_dim)
        )
        g0 = int(math.sqrt(num_pos - 1))
        grid = pos[:, 1:].reshape(1, g0, g0, cfg.patch_embed_dim)
        # torch-convention bicubic (get_abs_pos, efficient_sam_encoder.py:166;
        # jax.image.resize's a=-0.5 kernel deviates ~10% — golden-pinned in
        # tests/test_reference_golden_sam.py)
        grid = interpolate_bicubic(grid, (gh, gh))
        x = x + grid.astype(cfg.dtype)

        x = x.reshape(b, gh * gh, cfg.patch_embed_dim)
        for i in range(cfg.depth):
            x = ViTBlock(cfg.num_heads, cfg.mlp_ratio, cfg.dtype, name=f"blocks_{i}")(x)
        x = x.reshape(b, gh, gh, cfg.patch_embed_dim)

        x = nn.Conv(cfg.neck_dim, (1, 1), use_bias=False, dtype=cfg.dtype,
                    name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(cfg.neck_dim, (3, 3), use_bias=False, dtype=cfg.dtype,
                    name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)


class PromptEncoder(nn.Module):
    """Random-frequency PE + label-type embeddings
    (efficient_sam_decoder.py:17-137).  Labels: -1 invalid, 1 point,
    2 bbox top-left, 3 bbox bottom-right."""

    config: EfficientSAMConfig

    def setup(self):
        c = self.config.neck_dim
        self.gaussian = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, c // 2),
        )
        init = nn.initializers.normal(1.0)
        self.invalid_points = self.param("invalid_points", init, (1, c))
        self.point_embeddings = self.param("point_embeddings", init, (1, c))
        self.bbox_top_left = self.param("bbox_top_left_embeddings", init, (1, c))
        self.bbox_bottom_right = self.param(
            "bbox_bottom_right_embeddings", init, (1, c)
        )

    def _pe(self, coords01):
        c = 2 * coords01 - 1
        c = c @ self.gaussian.astype(jnp.float32)
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self) -> jnp.ndarray:
        g = self.config.img_size // self.config.patch_size
        y = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        x = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
        return self._pe(grid)  # [g, g, C]

    def __call__(self, points, labels):
        """points [B, N, 2] in encoder pixels, labels [B, N]."""
        s = self.config.img_size
        pts = (points + 0.5) / s
        emb = self._pe(pts)
        emb = emb + self.invalid_points[0] * (labels == -1)[..., None]
        emb = emb + self.point_embeddings[0] * (labels == 1)[..., None]
        emb = emb + self.bbox_top_left[0] * (labels == 2)[..., None]
        emb = emb + self.bbox_bottom_right[0] * (labels == 3)[..., None]
        return emb


class TwoWayAttention(nn.Module):
    heads: int
    downsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        c = q.shape[-1]
        ci = c // self.downsample
        d = ci // self.heads

        def proj(x, name):
            return nn.Dense(ci, dtype=self.dtype, name=name)(x)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)

        qh = split(proj(q, "q_proj")).astype(jnp.float32)
        kh = split(proj(k, "k_proj")).astype(jnp.float32)
        vh = split(proj(v, "v_proj"))
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(jnp.float32(d))
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh).transpose(0, 2, 1, 3)
        b, n = o.shape[0], o.shape[1]
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(o.reshape(b, n, ci))


class MLPBlock(nn.Module):
    hidden: int
    out: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden, dtype=self.dtype, name=f"layers_{i}")(x)
            x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc")(x)


class TwoWayBlock(nn.Module):
    heads: int
    mlp_dim: int
    skip_first_pe: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if not self.skip_first_pe:
            queries = queries + query_pe
        queries = queries + TwoWayAttention(
            self.heads, 1, self.dtype, name="self_attn"
        )(queries, queries, queries)
        queries = LayerNorm32(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + TwoWayAttention(
            self.heads, 2, self.dtype, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = LayerNorm32(name="norm2")(queries)

        queries = queries + MLPBlock(
            self.mlp_dim, queries.shape[-1], 1, self.dtype, name="mlp"
        )(queries)
        queries = LayerNorm32(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + TwoWayAttention(
            self.heads, 2, self.dtype, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = LayerNorm32(name="norm4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    config: EfficientSAMConfig

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_embeddings):
        """image_embeddings [B, g, g, C]; image_pe [g, g, C];
        sparse [B, N, C].  Returns (masks [B, M, 4g, 4g], iou [B, M])."""
        cfg = self.config
        c = cfg.neck_dim
        num_mask_tokens = cfg.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (num_mask_tokens, c)
        )
        b = sparse_embeddings.shape[0]
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.tile(out_tokens[None], (b, 1, 1)), sparse_embeddings], axis=1
        )

        g = image_embeddings.shape[1]
        keys = image_embeddings.reshape(b, g * g, c)
        key_pe = jnp.tile(image_pe.reshape(1, g * g, c), (b, 1, 1))

        queries = tokens
        for i in range(cfg.decoder_depth):
            queries, keys = TwoWayBlock(
                cfg.decoder_heads, cfg.decoder_mlp_dim,
                skip_first_pe=(i == 0), dtype=cfg.dtype, name=f"layers_{i}",
            )(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + TwoWayAttention(
            cfg.decoder_heads, 2, cfg.dtype, name="final_attn_token_to_image"
        )(q, k, keys)
        queries = LayerNorm32(name="norm_final_attn")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + num_mask_tokens]

        up = keys.reshape(b, g, g, c)
        dims = list(cfg.upscaling_dims)
        for i, dim in enumerate(dims):
            up = nn.ConvTranspose(
                dim, (2, 2), strides=(2, 2), dtype=cfg.dtype,
                name=f"upscale_{i}",
            )(up)
            if i < len(dims) - 1:
                up = nn.GroupNorm(num_groups=1, name=f"upscale_norm_{i}")(up)
            up = nn.gelu(up, approximate=False)

        # two hidden layers: hardcoded num_layers=2 in the reference's
        # output_hypernetworks_mlps (efficient_sam_decoder.py:201-212)
        hyper = jnp.stack(
            [
                MLPBlock(c, dims[-1], 2, cfg.dtype, name=f"hyper_mlps_{i}")(
                    mask_out[:, i]
                )
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # [B, M, d_up]
        gh, gw = up.shape[1], up.shape[2]
        masks = jnp.einsum("bmd,bhwd->bmhw", hyper, up)
        iou = MLPBlock(
            cfg.iou_hidden_dim, num_mask_tokens, 2, cfg.dtype,
            name="iou_prediction_head",
        )(iou_out)
        return masks, iou


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


class EfficientSAM(nn.Module):
    """End-to-end: images [B, H, W, 3] in [0,1] + point prompts -> masks.

    points [B, Q, N, 2] in input-image pixel coords (x, y); labels
    [B, Q, N] (1 point / 2 tl / 3 br / -1 pad).  Returns (masks
    [B, Q, M, h', w'] logits sorted by IoU desc, iou [B, Q, M]).
    """

    config: EfficientSAMConfig

    def setup(self):
        self.image_encoder = ImageEncoder(self.config, name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.config, name="prompt_encoder")
        self.mask_decoder = MaskDecoder(self.config, name="mask_decoder")

    def embed_image(self, images01):
        cfg = self.config
        x = (images01 - IMAGENET_MEAN) / IMAGENET_STD
        if x.shape[1] != cfg.img_size or x.shape[2] != cfg.img_size:
            # torch F.interpolate(bilinear, align_corners=False) == jax
            # bilinear with antialias OFF (the reference preprocess,
            # efficient_sam.py:224-233; resize/normalize commute since
            # bilinear weights sum to 1)
            x = jax.image.resize(
                x, (x.shape[0], cfg.img_size, cfg.img_size, 3),
                method="bilinear", antialias=False,
            )
        return self.image_encoder(x)

    def __call__(self, images01, points, labels):
        cfg = self.config
        b, input_h, input_w = images01.shape[0], images01.shape[1], images01.shape[2]
        q, n = points.shape[1], points.shape[2]
        emb = self.embed_image(images01)

        # rescale points to encoder pixels; pad/trim to max points
        # (efficient_sam.py:155-170, 84-104)
        scale = jnp.asarray(
            [cfg.img_size / input_w, cfg.img_size / input_h], jnp.float32
        )
        pts = jnp.where(points >= 0, points * scale, -1.0)
        m = cfg.decoder_max_points
        if n > m:
            pts, labels = pts[:, :, :m], labels[:, :, :m]
        elif n < m:
            pts = jnp.pad(pts, ((0, 0), (0, 0), (0, m - n), (0, 0)),
                          constant_values=-1.0)
            labels = jnp.pad(labels, ((0, 0), (0, 0), (0, m - n)),
                             constant_values=-1.0)

        sparse = self.prompt_encoder(
            pts.reshape(b * q, m, 2), labels.reshape(b * q, m)
        )
        emb_tiled = jnp.repeat(emb, q, axis=0)
        masks, iou = self.mask_decoder(
            emb_tiled, self.prompt_encoder.dense_pe(), sparse
        )
        # multimask: drop the first (single-mask) token (decoder fwd :272-276)
        masks = masks[:, 1:]
        iou = iou[:, 1:]
        nm = masks.shape[1]
        # sort by IoU descending (efficient_sam.py:147-152)
        order = jnp.argsort(-iou, axis=-1)
        iou = jnp.take_along_axis(iou, order, axis=-1)
        masks = jnp.take_along_axis(masks, order[:, :, None, None], axis=1)
        masks = masks.reshape(b, q, nm, masks.shape[-2], masks.shape[-1])
        return masks, iou.reshape(b, q, nm)


def segment_with_box(
    model: EfficientSAM, params, image_uint8, xyxy, out_size=None
):
    """Box-prompted segmentation (the Gradio flow, src/demo/utils.py:40-100):
    two labeled corner points -> best mask resized to the image, uint8 0/255."""
    import numpy as np

    img = jnp.asarray(image_uint8).astype(jnp.float32)[None] / 255.0
    x0, y0, x1, y1 = [float(v) for v in xyxy]
    pts = jnp.asarray([[[[x0, y0], [x1, y1]]]], jnp.float32)
    lbl = jnp.asarray([[[2.0, 3.0]]], jnp.float32)
    masks, iou = model.apply(params, img, pts, lbl)
    best = masks[0, 0, 0]
    h, w = image_uint8.shape[:2]
    # torch-convention bicubic (the reference's output interpolate,
    # efficient_sam.py:127-129)
    best = interpolate_bicubic(best[..., None], (h, w))[..., 0]
    return (np.asarray(best) > 0).astype(np.uint8) * 255
