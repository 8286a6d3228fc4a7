"""Depth-Anything (DPT head on DINOv2) in Flax, NHWC.

Reimplements the reference monocular depth model
(/root/reference/depth_anything/dpt.py:22-166 + blocks.py) used for the
depth-based 3D editing path (src/utils/geo_utils.py back-projection) and the
GeoBench 3D transform pipeline
(evaluation/FreeFine/get_3d_transform_correspondence.py).

Structure (vits defaults): DINOv2 last-4-block patch tokens -> per-layer 1x1
projections to [48, 96, 192, 384] -> resize stack (x4 deconv, x2 deconv,
identity, /2 conv) -> 3x3 scratch convs to 64 features -> 4 RefineNet-style
fusion blocks with align-corners bilinear upsampling -> conv head -> ReLU
depth at input resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.models.dinov2 import DINOv2, DINOv2Config, dinov2_vits14


def _resize_axis_align_corners(x: jnp.ndarray, axis: int, out: int) -> jnp.ndarray:
    """Linear resize along one axis with align_corners=True semantics
    (torch F.interpolate(..., align_corners=True), dpt.py:133,163)."""
    n = x.shape[axis]
    if n == out:
        return x
    if n == 1:
        reps = [1] * x.ndim
        reps[axis] = out
        return jnp.tile(x, reps)
    pos = jnp.linspace(0.0, n - 1.0, out)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    frac = (pos - i0).astype(x.dtype)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i0 + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out
    frac = frac.reshape(shape)
    return a * (1 - frac) + b * frac


def resize_bilinear_align_corners(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] -> [B, h, w, C], separable align-corners bilinear."""
    x = _resize_axis_align_corners(x, 1, size[0])
    return _resize_axis_align_corners(x, 2, size[1])


class ResidualConvUnit(nn.Module):
    """blocks.py ResidualConvUnit: ReLU-Conv-ReLU-Conv + skip."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """blocks.py FeatureFusionBlock (deconv=False, expand=False)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_bilinear_align_corners(x, size)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    backbone: DINOv2Config = dataclasses.field(default_factory=dinov2_vits14)
    features: int = 64
    out_channels: Tuple[int, ...] = (48, 96, 192, 384)


def depth_anything_vits() -> DepthAnythingConfig:
    return DepthAnythingConfig()


def depth_anything_vitb() -> DepthAnythingConfig:
    from freefine_tpu.models.dinov2 import dinov2_vitb14

    return DepthAnythingConfig(
        backbone=dinov2_vitb14(), features=128, out_channels=(96, 192, 384, 768)
    )


def depth_anything_vitl() -> DepthAnythingConfig:
    from freefine_tpu.models.dinov2 import dinov2_vitl14

    return DepthAnythingConfig(
        backbone=dinov2_vitl14(), features=256, out_channels=(256, 512, 1024, 1024)
    )


class DPTHead(nn.Module):
    config: DepthAnythingConfig

    @nn.compact
    def __call__(self, features, patch_h: int, patch_w: int):
        cfg = self.config
        dt = cfg.backbone.dtype
        outs = []
        for i, (patch_tokens, _cls) in enumerate(features):
            b, n, c = patch_tokens.shape
            x = patch_tokens.reshape(b, patch_h, patch_w, c)
            x = nn.Conv(
                cfg.out_channels[i], (1, 1), dtype=dt, name=f"projects_{i}"
            )(x)
            if i == 0:
                x = nn.ConvTranspose(
                    cfg.out_channels[i], (4, 4), strides=(4, 4),
                    dtype=dt, name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    cfg.out_channels[i], (2, 2), strides=(2, 2),
                    dtype=dt, name="resize_1",
                )(x)
            elif i == 3:
                # explicit torch pad=1 (== SAME only at the odd 37-patch
                # grid of the 518 default; even grids would deviate)
                x = nn.Conv(
                    cfg.out_channels[i], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=dt, name="resize_3",
                )(x)
            outs.append(x)

        rn = [
            nn.Conv(
                cfg.features, (3, 3), use_bias=False, dtype=dt,
                name=f"layer{i+1}_rn",
            )(outs[i])
            for i in range(4)
        ]

        path4 = FeatureFusionBlock(cfg.features, dt, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        path3 = FeatureFusionBlock(cfg.features, dt, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[1:3]
        )
        path2 = FeatureFusionBlock(cfg.features, dt, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[1:3]
        )
        path1 = FeatureFusionBlock(cfg.features, dt, name="refinenet1")(path2, rn[0])

        h = nn.Conv(cfg.features // 2, (3, 3), dtype=dt, name="output_conv1")(path1)
        h = resize_bilinear_align_corners(h, (patch_h * 14, patch_w * 14))
        h = nn.Conv(32, (3, 3), dtype=dt, name="output_conv2_0")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=dt, name="output_conv2_2")(h)
        return nn.relu(h)


class DepthAnything(nn.Module):
    """Monocular depth: [B, H, W, 3] normalised RGB -> [B, H, W] depth."""

    config: DepthAnythingConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, h, w, _ = x.shape
        p = cfg.backbone.patch_size
        assert h % p == 0 and w % p == 0, f"H,W must be multiples of {p}"
        feats = DINOv2(cfg.backbone, name="pretrained")(x, num_intermediate=4)
        depth = DPTHead(cfg, name="depth_head")(feats, h // p, w // p)
        depth = resize_bilinear_align_corners(depth, (h, w))
        return jnp.maximum(depth[..., 0], 0.0)


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def preprocess_depth_input(img_uint8: jnp.ndarray, size: int = 518) -> jnp.ndarray:
    """uint8 RGB [H, W, 3] -> normalised [1, size', size', 3] with both dims
    multiples of 14 (the reference Resize transform keeps aspect ratio and
    rounds to multiple-of-14, depth_anything/util/transform.py)."""
    x = img_uint8.astype(jnp.float32) / 255.0
    h, w = x.shape[:2]
    scale = size / min(h, w)
    nh = int(round(h * scale / 14)) * 14
    nw = int(round(w * scale / 14)) * 14
    x = jax.image.resize(x, (nh, nw, 3), method="cubic")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x[None]
