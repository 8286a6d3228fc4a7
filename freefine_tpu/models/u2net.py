"""U^2-Net salient-object matting in Flax, NHWC — the rembg replacement.

The reference calls `rembg` (an ONNX U^2-Net) to re-extract object masks
from SV3D novel views (/root/reference/src/demo/model.py:982-1006
`get_mask_from_rembg`, generative-models/scripts/sampling/re_edit_3d.py:606).
This is the same architecture natively in Flax: six RSU (ReSidual U-block)
encoder stages, five decoder stages, six side outputs fused into the final
saliency map.  `u2netp_config()` matches rembg's lightweight u2netp;
`u2net_config()` the full model.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBNReLU(nn.Module):
    features: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3),
            kernel_dilation=(self.dilation, self.dilation),
            padding=((self.dilation, self.dilation),) * 2,
            dtype=self.dtype, name="conv",
        )(x)
        # inference-mode BN (running stats as params, like inception.py)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        return nn.relu(x)


def _down(x):
    return nn.max_pool(x, (2, 2), (2, 2), "SAME")


def _up_to(x, ref):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, ref.shape[1], ref.shape[2], c), "linear")


class RSU(nn.Module):
    """ReSidual U-block of the given depth."""

    depth: int       # number of encoder levels (7 for RSU7 ... 4 for RSU4)
    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hxin = ConvBNReLU(self.out, dtype=self.dtype, name="rebnconvin")(x)
        enc = [ConvBNReLU(self.mid, dtype=self.dtype, name="rebnconv1")(hxin)]
        h = enc[0]
        for i in range(2, self.depth):
            h = _down(h)
            h = ConvBNReLU(self.mid, dtype=self.dtype, name=f"rebnconv{i}")(h)
            enc.append(h)
        # bottom: dilated conv, no downsample
        hb = ConvBNReLU(self.mid, dilation=2, dtype=self.dtype,
                        name=f"rebnconv{self.depth}")(enc[-1])
        h = hb
        for i in range(self.depth - 1, 1, -1):
            h = ConvBNReLU(
                self.mid, dtype=self.dtype, name=f"rebnconv{i}d"
            )(jnp.concatenate([h, enc[i - 1]], axis=-1))
            h = _up_to(h, enc[i - 2])
        h = ConvBNReLU(
            self.out, dtype=self.dtype, name="rebnconv1d"
        )(jnp.concatenate([h, enc[0]], axis=-1))
        return h + hxin


class RSU4F(nn.Module):
    """Dilation-only RSU (no resolution change)."""

    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hxin = ConvBNReLU(self.out, dtype=self.dtype, name="rebnconvin")(x)
        h1 = ConvBNReLU(self.mid, 1, self.dtype, name="rebnconv1")(hxin)
        h2 = ConvBNReLU(self.mid, 2, self.dtype, name="rebnconv2")(h1)
        h3 = ConvBNReLU(self.mid, 4, self.dtype, name="rebnconv3")(h2)
        h4 = ConvBNReLU(self.mid, 8, self.dtype, name="rebnconv4")(h3)
        h3d = ConvBNReLU(self.mid, 4, self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], -1)
        )
        h2d = ConvBNReLU(self.mid, 2, self.dtype, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], -1)
        )
        h1d = ConvBNReLU(self.out, 1, self.dtype, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], -1)
        )
        return h1d + hxin


@dataclasses.dataclass(frozen=True)
class U2NetConfig:
    # (depth, mid, out) per encoder stage; stages 5, 6 are RSU4F
    stages: Tuple[Tuple[int, int, int], ...] = (
        (7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512),
        (0, 256, 512), (0, 256, 512),
    )
    # decoder (depth, mid, out), from stage5d to stage1d
    dstages: Tuple[Tuple[int, int, int], ...] = (
        (0, 256, 512), (4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64),
    )
    dtype: jnp.dtype = jnp.float32


def u2net_config() -> U2NetConfig:
    return U2NetConfig()


def u2netp_config() -> U2NetConfig:
    """Lightweight u2netp (rembg default 'u2netp')."""
    return U2NetConfig(
        stages=((7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64),
                (0, 16, 64), (0, 16, 64)),
        dstages=((0, 16, 64), (4, 16, 64), (5, 16, 64), (6, 16, 64),
                 (7, 16, 64)),
    )


class U2Net(nn.Module):
    config: U2NetConfig

    @nn.compact
    def __call__(self, x):
        """[B, H, W, 3] in [0,1] -> [B, H, W] saliency in (0,1)."""
        cfg = self.config
        dt = cfg.dtype
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = ((x - mean) / std).astype(dt)

        encs = []
        h = x
        for i, (depth, mid, out) in enumerate(cfg.stages):
            blk = (
                RSU4F(mid, out, dt, name=f"stage{i+1}")
                if depth == 0 else RSU(depth, mid, out, dt, name=f"stage{i+1}")
            )
            h = blk(h)
            encs.append(h)
            if i < len(cfg.stages) - 1:
                h = _down(h)

        sides = [encs[-1]]
        h = encs[-1]
        for i, (depth, mid, out) in enumerate(cfg.dstages):
            skip = encs[len(cfg.stages) - 2 - i]
            h = _up_to(h, skip)
            h = jnp.concatenate([h, skip], axis=-1)
            blk = (
                RSU4F(mid, out, dt, name=f"stage{5-i}d")
                if depth == 0 else RSU(depth, mid, out, dt, name=f"stage{5-i}d")
            )
            h = blk(h)
            sides.append(h)

        full = x.shape[1:3]
        outs = []
        for i, s in enumerate(reversed(sides)):  # side1 (finest) .. side6
            o = nn.Conv(1, (3, 3), dtype=dt, name=f"side{i+1}")(s)
            o = jax.image.resize(o, (o.shape[0],) + full + (1,), "linear")
            outs.append(o)
        fused = nn.Conv(1, (1, 1), dtype=dt, name="outconv")(
            jnp.concatenate(outs, axis=-1)
        )
        return jax.nn.sigmoid(fused[..., 0].astype(jnp.float32))


def get_mask_from_saliency(
    model: U2Net, params, image_uint8, size: int = 320, threshold: float = 0.5
):
    """rembg-style object mask (reference get_mask_from_rembg,
    src/demo/model.py:982-1006): saliency at 320^2, resized back,
    thresholded to 0/255."""
    import numpy as np

    h, w = image_uint8.shape[:2]
    x = jnp.asarray(image_uint8, jnp.float32)[None] / 255.0
    x = jax.image.resize(x, (1, size, size, 3), "linear")
    sal = model.apply(params, x)[0]
    sal = (sal - sal.min()) / jnp.maximum(sal.max() - sal.min(), 1e-8)
    sal = jax.image.resize(sal, (h, w), "linear")
    return (np.asarray(sal) > threshold).astype(np.uint8) * 255
