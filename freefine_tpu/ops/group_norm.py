"""Fused GroupNorm(+SiLU) Pallas kernel.

BATCH_SCALING.md identifies the UNet's GroupNorm-heavy segments as
HBM-bound: XLA lowers GroupNorm to a stats-reduce kernel plus a separate
normalize(+silu) kernel, reading the activation twice.  This kernel does
one pass per tile — load an (H, W, C-block) slab into VMEM once, compute
its group statistics, normalize, apply the affine and the SiLU, write
once — halving the HBM traffic of those segments.

Tiling: one grid step per batch image with the full (H, W, C) slab
resident in its input dtype; the float32 work happens in row chunks
inside the kernel.  (A channel-block grid is impossible here: Mosaic
requires 128-multiple lane blocks and SD's group size is 10 channels,
so no block boundary can align with both.  The first full-slab-f32
design OOM'd the 16 MB scoped VMEM at 24.2 MB for 64^2 x 320 and
motivated the two-sweep redesign.)

Group statistics use one-hot matmuls instead of in-kernel reshapes
(lane-dim reshapes of the (C,) vectors are what Mosaic dislikes):
`sums (1, Cb) @ onehot (Cb, Gb)` reduces channels to groups on the MXU
and `(1, Gb) @ onehot^T` broadcasts the stats back; both one-hots are
built in-kernel from iota — no extra HBM operand.

MEASURED RESULT (v5 lite, paired end-to-end bench @512^2 50-step,
BATCH_SCALING.md): fused 33.0 vs unfused 34.6 edits/min — ~4.5% SLOWER.
XLA's lowering already fuses normalize+SiLU into the consumer conv's
input fusion (its real extra traffic is only the stats read), and the
kernel's sequential in-VMEM sweeps pipeline worse than XLA's overlapped
reduce.  The kernel is therefore OFF by default and kept as a verified
negative result; FREEFINE_FUSED_GN env: "0" (default), "auto" (on-TPU
when the tile fits), "1" (force, interpret off-TPU — used by the parity
tests).

Reference counterpart: torch.nn.GroupNorm inside ResnetBlock2D
(diffusers resnet.py; reference UNet via src/models) — there cuDNN
fuses nothing either; this is a TPU-first improvement, not a port.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one image's tile: bf16 in + bf16 out resident plus the
# per-chunk float32 working set.  Mosaic pads the lane (channel) dim to
# 128.  Keep well under the 16 MB scoped limit.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_ROW_CHUNK = 8  # sublane-aligned rows per in-kernel sweep step


def _pad128(c: int) -> int:
    return ((c + 127) // 128) * 128


def _tile_bytes(h: int, w: int, c: int, itemsize: int = 2) -> int:
    cp = _pad128(c)
    resident = 2 * h * w * cp * itemsize       # in + out slabs
    working = 4 * _ROW_CHUNK * w * cp * 4      # ~4 f32 chunk temporaries
    return resident + working


def _mode() -> str:
    return os.environ.get("FREEFINE_FUSED_GN", "0")


def use_fused(shape, num_groups: int = 32, itemsize: int = 2) -> bool:
    """Decide the fused path for an [B, H, W, C] activation shape."""
    m = _mode()
    if m == "0":
        return False
    h, w, c = shape[-3], shape[-2], shape[-1]
    if c % num_groups or h % _ROW_CHUNK:
        return False
    fits = _tile_bytes(h, w, c, itemsize) <= _VMEM_BUDGET_BYTES
    if m == "1":
        return fits
    return fits and jax.default_backend() == "tpu"


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *,
               eps: float, apply_silu: bool, group_size: int,
               row_chunk: int):
    """One batch image.  The bf16 slab stays VMEM-resident; two in-kernel
    sweeps over row chunks (stats, then normalize) keep the float32
    working set to one chunk — 1 HBM read + 1 write total, vs XLA's
    reduce-then-normalize pair that reads the activation twice.

    The channel->group reduction and its broadcast run as tiny one-hot
    matmuls with the one-hots built in-kernel from iota (no HBM input)."""
    _, h, w, c = x_ref.shape
    g = c // group_size
    n_elem = h * w * group_size               # elements per group
    n_chunks = h // row_chunk
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    gmat = (ch // group_size == gr).astype(jnp.float32)   # [C, G]
    ch_t = jax.lax.broadcasted_iota(jnp.int32, (g, c), 1)
    gr_t = jax.lax.broadcasted_iota(jnp.int32, (g, c), 0)
    gmat_t = (ch_t // group_size == gr_t).astype(jnp.float32)  # [G, C]

    def stats_body(i, acc):
        s1, s2 = acc
        xc = x_ref[0, pl.ds(i * row_chunk, row_chunk)].astype(jnp.float32)
        s1 = s1 + jnp.sum(xc, axis=(0, 1))[None]          # [1, C]
        s2 = s2 + jnp.sum(xc * xc, axis=(0, 1))[None]
        return s1, s2

    s1, s2 = jax.lax.fori_loop(
        0, n_chunks, stats_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)),
    )
    g1 = jnp.dot(s1, gmat, preferred_element_type=jnp.float32)   # [1, G]
    g2 = jnp.dot(s2, gmat, preferred_element_type=jnp.float32)
    mean_g = g1 / n_elem
    var_g = g2 / n_elem - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, gmat_t,
                     preferred_element_type=jnp.float32)[0][None, None]
    inv_c = jnp.dot(inv_g, gmat_t,
                    preferred_element_type=jnp.float32)[0][None, None]
    sc = scale_ref[...][0][None, None]        # [1, 1, C]
    bs = bias_ref[...][0][None, None]

    def norm_body(i, _):
        xc = x_ref[0, pl.ds(i * row_chunk, row_chunk)].astype(jnp.float32)
        y = (xc - mean_c) * inv_c * sc + bs
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * row_chunk, row_chunk)] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_gn(x, scale, bias, num_groups, eps, apply_silu):
    return _fused_gn_impl(x, scale, bias, num_groups, eps, apply_silu)


def _fused_gn_fwd(x, scale, bias, num_groups, eps, apply_silu):
    return (
        _fused_gn_impl(x, scale, bias, num_groups, eps, apply_silu),
        (x, scale, bias),
    )


def _fused_gn_bwd(num_groups, eps, apply_silu, res, ct):
    # backward through the plain-XLA math (identical function); the fused
    # kernel only accelerates the forward/inference hot path
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, sc, bb: group_norm_reference(
            xx, sc, bb, num_groups=num_groups, eps=eps,
            apply_silu=apply_silu,
        ),
        x, scale, bias,
    )
    return vjp(ct)


_fused_gn.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def group_norm_silu(
    x: jnp.ndarray,        # [B, H, W, C]
    scale: jnp.ndarray,    # [C]
    bias: jnp.ndarray,     # [C]
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    apply_silu: bool = True,
) -> jnp.ndarray:
    """One-pass fused GroupNorm(+SiLU); output in x.dtype.
    Differentiable (custom VJP backed by the XLA reference math)."""
    return _fused_gn(x, scale, bias, num_groups, eps, apply_silu)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "apply_silu")
)
def _fused_gn_impl(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    apply_silu: bool = True,
) -> jnp.ndarray:
    b, h, w, c = x.shape
    g = num_groups
    assert c % g == 0, (c, g)
    assert h % _ROW_CHUNK == 0, (h, _ROW_CHUNK)

    kernel = functools.partial(
        _gn_kernel, eps=eps, apply_silu=apply_silu, group_size=c // g,
        row_chunk=_ROW_CHUNK,
    )
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, scale.astype(jnp.float32)[None], bias.astype(jnp.float32)[None])


def group_norm_reference(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, *,
    num_groups: int = 32, eps: float = 1e-5, apply_silu: bool = True,
) -> jnp.ndarray:
    """Plain-XLA GroupNorm(+SiLU), float32 statistics — the exact math of
    flax nn.GroupNorm; golden path for the fused kernel."""
    b, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)
