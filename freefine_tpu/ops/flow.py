"""RAFT-style correlation volume as plain XLA ops.

The reference's MotionGuidance baseline ships a CUDA extension
(`alt_cuda_corr`, evaluation/MotionGuidance/flow_models/raft/alt_cuda_corr/
correlation_kernel.cu) plus the matmul fallback `CorrBlock`
(flow_models/raft/corr_raft.py:12-61) to evaluate all-pairs feature
correlation and local windowed lookups for optical flow.  On TPU the
all-pairs volume is one einsum the MXU eats directly, the pyramid is
average pooling, and the windowed lookup is a bilinear gather — no custom
kernel needed.

Layout is NHWC throughout (TPU-native), vs the reference's NCHW.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def correlation_volume(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation (CorrBlock.corr, corr_raft.py:53-61).

    fmap1/fmap2 [B, H, W, C] -> [B, H1, W1, H2, W2] scaled by 1/sqrt(C).
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.float32)
    f2 = fmap2.reshape(b, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2) / jnp.sqrt(jnp.float32(c))
    return corr.reshape(b, h, w, h, w)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool over the trailing two spatial dims of
    [N, H, W].  Odd trailing rows/cols are dropped, matching torch
    F.avg_pool2d(2, 2)'s floor behaviour (corr_raft.py:25)."""
    n, h, w = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    x = x.reshape(n, h // 2, 2, w // 2, 2)
    return x.mean(axis=(2, 4))


def corr_pyramid(corr: jnp.ndarray, num_levels: int = 4) -> List[jnp.ndarray]:
    """Pool the target dims of the volume into a pyramid
    (corr_raft.py:22-26).  Returns [B*H1*W1, H2/2^i, W2/2^i] per level."""
    b, h1, w1, h2, w2 = corr.shape
    level = corr.reshape(b * h1 * w1, h2, w2)
    out = [level]
    for _ in range(num_levels - 1):
        level = avg_pool2(level)
        out.append(level)
    return out


def bilinear_sample_2d(img: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray):
    """Bilinear sample of [H, W] at fractional (yy, xx) with zero padding —
    RAFT's `bilinear_sampler` (grid_sample, align_corners=True)."""
    return jax.scipy.ndimage.map_coordinates(
        img, [yy, xx], order=1, mode="constant", cval=0.0
    )


def corr_lookup(
    pyramid: Sequence[jnp.ndarray],
    coords: jnp.ndarray,
    radius: int = 4,
) -> jnp.ndarray:
    """Windowed pyramid lookup (CorrBlock.__call__, corr_raft.py:30-50).

    coords [B, H1, W1, 2] in (x, y) pixel units of level 0.  Returns
    [B, H1, W1, num_levels * (2r+1)^2] correlation features.
    """
    r = radius
    n_win = 2 * r + 1
    b, h1, w1, _ = coords.shape
    flat_coords = coords.reshape(b * h1 * w1, 2)
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dyy, dxx = jnp.meshgrid(offs, offs, indexing="ij")

    out = []
    for i, level in enumerate(pyramid):
        centers = flat_coords / (2.0 ** i)

        def one(pix_corr, center):
            # RAFT enumerates the window TRANSPOSED: delta=(dy[a], dx[b])
            # is added to the (x, y) centroid, so the x-offset varies
            # along the FIRST window axis (corr_raft.py:37-43 —
            # upstream RAFT does the same; trained checkpoints encode
            # this ordering in the motion encoder's first conv).
            yy = center[1] + dxx
            xx = center[0] + dyy
            return bilinear_sample_2d(pix_corr, yy, xx)

        win = jax.vmap(one)(level, centers)           # [BHW, 2r+1, 2r+1]
        out.append(win.reshape(b, h1, w1, n_win * n_win))
    return jnp.concatenate(out, axis=-1)


def corr_block(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    num_levels: int = 4,
    radius: int = 4,
) -> jnp.ndarray:
    """Volume + pyramid + lookup in one call (the full CorrBlock path)."""
    pyr = corr_pyramid(correlation_volume(fmap1, fmap2), num_levels)
    return corr_lookup(pyr, coords, radius)
