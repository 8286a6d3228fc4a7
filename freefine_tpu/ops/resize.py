"""torch-convention bicubic interpolation as static weight matmuls.

`jax.image.resize(method="bicubic")` uses the Keys kernel with a=-0.5
(and antialiases on downsample); torch's `F.interpolate(mode="bicubic",
align_corners=False)` uses the cubic-convolution kernel with A=-0.75,
half-pixel centres, border-replicated taps, and no antialiasing.  The
two disagree by ~10% relative on a 14->64 upsample, which matters for
models re-hosted from torch (EfficientSAM's ViT pos-embed interpolation,
/root/reference/sam/efficient_sam/efficient_sam_encoder.py:166-172, and
its output-mask upsampling, efficient_sam.py:127-129).

Because every resize in these models has static shapes, the exact torch
operator is just two small dense matmuls: out = W_h @ x @ W_w^T with
weights precomputed in numpy at trace time.  That is also the
TPU-friendly formulation (MXU work, no gathers).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def torch_cubic_weight_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] row-stochastic matrix reproducing torch's 1-D
    upsample_bicubic (align_corners=False, antialias=False, A=-0.75)."""
    A = -0.75
    out = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        # cubic convolution weights for taps at offsets -1, 0, 1, 2
        w = np.empty(4, np.float64)
        w[0] = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
        w[1] = ((A + 2) * t - (A + 3)) * t * t + 1
        w[2] = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) ** 2 + 1
        w[3] = 1.0 - w[0] - w[1] - w[2]
        for tap, wt in zip(range(i0 - 1, i0 + 3), w):
            out[o, min(max(tap, 0), n_in - 1)] += wt
    return out.astype(np.float32)


def interpolate_bicubic(x: jnp.ndarray, size, h_axis: int = -3,
                        w_axis: int = -2) -> jnp.ndarray:
    """torch `F.interpolate(mode="bicubic", align_corners=False)` on two
    axes of `x` (defaults to NHWC's H and W).  `size` is (out_h, out_w)."""
    h_axis %= x.ndim
    w_axis %= x.ndim
    out_h, out_w = int(size[0]), int(size[1])
    wh = jnp.asarray(torch_cubic_weight_matrix(x.shape[h_axis], out_h))
    ww = jnp.asarray(torch_cubic_weight_matrix(x.shape[w_axis], out_w))
    dt = x.dtype
    x = jnp.tensordot(wh, x.astype(jnp.float32), axes=((1,), (h_axis,)))
    # tensordot puts the contracted-out axis first; restore position
    x = jnp.moveaxis(x, 0, h_axis)
    x = jnp.tensordot(ww, x, axes=((1,), (w_axis,)))
    x = jnp.moveaxis(x, 0, w_axis)
    return x.astype(dt)
