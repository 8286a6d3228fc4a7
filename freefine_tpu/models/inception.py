"""InceptionV3 (pytorch-fid variant) in Flax, NHWC — the FID feature extractor.

The reference's FID uses pytorch-fid's InceptionV3
(/root/reference/evaluation/metrics/FID/fid_score.py + fid.py:23-44):
torchvision inception_v3 with the FID-specific tweaks — branch average
pools with count_include_pad=False (FIDInceptionA/C/E_1) and a max pool in
FIDInceptionE_2's pool branch — producing the canonical 2048-d pool3
features at 299x299 with inputs scaled to [-1, 1].

BatchNorms run in inference mode as affine transforms over stored running
statistics (eps 1e-3, torchvision convention).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn


class BNConv(nn.Module):
    """Conv2d (no bias) + BatchNorm(eps=1e-3, inference) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str | Tuple = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        x = (x - mean) / jnp.sqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_noinc(x, window=3):
    """3x3 stride-1 average pool with count_include_pad=False (the FID
    fix, pytorch-fid inception.py FIDInception*)."""
    pad = window // 2
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return s / n


def _max_pool(x, window=3, stride=2, pad="VALID"):
    return nn.max_pool(x, (window, window), (stride, stride), pad)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BNConv(64, (1, 1), name="branch1x1")(x)
        b5 = BNConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BNConv(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BNConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BNConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BNConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_noinc(x)
        bp = BNConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BNConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BNConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BNConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BNConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BNConv(192, (1, 1), name="branch1x1")(x)
        b7 = BNConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BNConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BNConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BNConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BNConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BNConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BNConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BNConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_noinc(x)
        bp = BNConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BNConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BNConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BNConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BNConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BNConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BNConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool  # FIDInceptionE_2 uses max pool in the pool branch

    @nn.compact
    def __call__(self, x):
        b1 = BNConv(320, (1, 1), name="branch1x1")(x)
        b3 = BNConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BNConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BNConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BNConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BNConv(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = BNConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BNConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_noinc(x)
        bp = BNConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """[B, h, w, 3] -> [B, 2048] pool3 features.

    Inputs not already 299² are upsampled in-model (pytorch-fid
    resize_input); the canonical reference feed is `preprocess_fid`'s
    224² ImageNet-normalised tensor."""

    @nn.compact
    def __call__(self, x):
        if x.shape[1] != 299 or x.shape[2] != 299:
            # pytorch-fid resize_input: F.interpolate(size=299, bilinear,
            # align_corners=False) — half-pixel, NO antialias (the
            # reference feeds it 224² ImageNet-normalised tensors,
            # FID/fid_score.py:124; torch-parity-tested in
            # tests/test_metric_preprocessing.py)
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear",
                antialias=False,
            )
        x = 2.0 * x - 1.0  # pytorch-fid normalize_input
        x = BNConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BNConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BNConv(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BNConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BNConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(False, name="Mixed_7b")(x)
        x = InceptionE(True, name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # adaptive avg pool -> [B, 2048]


def preprocess_fid(img_uint8) -> jnp.ndarray:
    """uint8 [H, W, 3] -> [1, 224, 224, 3] ImageNet-normalised — the
    reference FID stack's own input chain (its modified
    FID/fid_score.py:122-124 applies Resize((224, 224)) + ImageNet
    normalise before EVERY FID-family model); the model upsamples to 299
    internally (pytorch-fid resize_input)."""
    from freefine_tpu.metrics.preprocess import fid_input_transform

    return jnp.asarray(fid_input_transform(np.asarray(img_uint8)))
