"""Pallas TPU flash attention with fused editing hooks.

The reference bounds attention memory with xformers + attention slicing
(evaluation/FreeFine/freefine_batch_infer_2d.py:156-157) and materialises
O(S^2) additive masks per layer (src/utils/attention.py:862-889).  Here both
problems are solved in-kernel:

  * `flash_sdpa`    — streaming softmax attention, O(S) memory, with an
    optional per-key 0/1 mask turned into an additive bias inside the
    kernel.  Covers vanilla attention, ssa/sdsa (KV pre-concatenated to
    2S), compose per-source attention, and cross-attention.
  * `tca_flash`     — the fused Temporal-Contextual Attention step
    (attention.py:1043-1091): THREE streaming attentions in one pass over
    the KV stream (self over own K/V; FG-masked and BG-masked over the
    modulated K/V), composited per query by the target mask and blended by
    context_guidance — one kernel instead of three SDPA calls + composite.

Layout: q/k/v are [BH, S, D] (batch*heads flattened); masks are per-batch
[B, S] with BH = B * heads.  All logits/softmax accumulate in float32;
inputs may be bf16.  Key masking uses a finite -1e9 bias, matching the
reference's finfo.min convention (fully-masked rows degrade to uniform
attention rather than NaN).

Block sizes default to 512x512 tiles; the last (head) dimension is padded
to the 128-lane TPU tile by Mosaic (SD-1.5 head_dim is 40/80/160).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_M_INIT = -1e30

# Matmul feed precision. 'bf16' (default) feeds the MXU its native input
# dtype — bf16 x bf16 with f32 accumulation — for the QK^T and PV products
# (softmax statistics stay f32 either way).  'f32' upcasts the operands
# first: ~4x slower MXU passes, bit-stable vs the einsum golden path, used
# by the numerics tests.  bf16-feed output deltas vs f32 measured at
# 1e-3..4e-3 absolute on SD shapes — noise relative to the bf16 activations
# the UNet already carries.
_COMPUTE_BF16 = os.environ.get("FREEFINE_FLASH_COMPUTE", "bf16") != "f32"


def _feed(x: jnp.ndarray) -> jnp.ndarray:
    """Matmul operand in the configured feed precision."""
    return x if _COMPUTE_BF16 else x.astype(jnp.float32)


def _pv(p: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """probs @ values with f32 accumulation; probs cast to the value dtype
    when feeding bf16 (p in [0, 1] loses < 0.4% relative)."""
    return jax.lax.dot_general(
        p.astype(v.dtype) if _COMPUTE_BF16 else p,
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pick_block(s: int, target: int = 512) -> int:
    b = min(s, target)
    while s % b:
        b //= 2
    return max(b, 1)


# ---------------------------------------------------------------------------
# Generic masked flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_s, l_s, acc_s, *, scale, use_mask):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, _M_INIT)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = _feed(q_ref[0])                         # [BQ, D]
    k = _feed(k_ref[0])                         # [BK, D]
    v = _feed(v_ref[0])                         # [BK, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # [BQ, BK]
    if use_mask:
        s = s + (mask_ref[0, 0][None, :] - 1.0) * -NEG_INF  # broadcast over BQ

    m_prev = m_s[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    corr = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None])
    l_s[:, 0] = l_s[:, 0] * corr + jnp.sum(p, axis=1)
    acc_s[:] = acc_s[:] * corr[:, None] + _pv(p, v)
    m_s[:, 0] = m_cur

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_s[:] / jnp.maximum(l_s[:, 0], 1e-30)[:, None]).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k"))
def flash_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    heads: int,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """Streaming attention.  q [B, Sq, H*D]; k/v [B, Sk, H*D];
    key_mask [B, Sk] in {0,1} (0 = key masked out) or None.
    Returns [B, Sq, H*D]."""
    b, sq, e = q.shape
    sk = k.shape[1]
    d = e // heads
    bq = _pick_block(sq, block_q)
    bk = _pick_block(sk, block_k)

    def split(x, s):
        return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, s, d)

    qh, kh, vh = split(q, sq), split(k, sk), split(v, sk)
    mask = (
        jnp.ones((b, sk), jnp.float32) if key_mask is None
        else key_mask.astype(jnp.float32)
    )[:, None, :]  # [B, 1, Sk]: TPU blocks need the sublane dim == array dim
    scale = 1.0 / (d ** 0.5)

    grid = (b * heads, sq // bq, sk // bk)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, use_mask=key_mask is not None
        ),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec(
                (1, 1, bk), lambda h, qi, ki, _hh=heads: (h // _hh, 0, ki)
            ),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )(qh, kh, vh, mask)
    return out.reshape(b, heads, sq, d).transpose(0, 2, 1, 3).reshape(b, sq, e)


# ---------------------------------------------------------------------------
# Fused TCA kernel: self + FG-ref + BG-ref attention in one KV sweep
# ---------------------------------------------------------------------------


def _tca_kernel(
    q_ref, ks_ref, vs_ref, km_ref, vm_ref, fg_ref, tq_ref, cg_ref,
    o_ref,
    ms_s, ls_s, accs_s, mf_s, lf_s, accf_s, mb_s, lb_s, accb_s,
    *, scale,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        for m in (ms_s, mf_s, mb_s):
            m[:] = jnp.full_like(m, _M_INIT)
        for l in (ls_s, lf_s, lb_s):
            l[:] = jnp.zeros_like(l)
        for a in (accs_s, accf_s, accb_s):
            a[:] = jnp.zeros_like(a)

    q = _feed(q_ref[0])
    fg = fg_ref[0, 0][None, :]                    # [1, BK] 0/1 key mask

    def update(s, m_s, l_s, acc_s, v):
        m_prev = m_s[:, 0]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        corr = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_s[:, 0] = l_s[:, 0] * corr + jnp.sum(p, axis=1)
        acc_s[:] = acc_s[:] * corr[:, None] + _pv(p, v)
        m_s[:, 0] = m_cur

    # self attention over own K/V
    ks = _feed(ks_ref[0])
    vs = _feed(vs_ref[0])
    s_self = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    update(s_self, ms_s, ls_s, accs_s, vs)

    # FG / BG masked attention over modulated (reference-stream) K/V —
    # ONE logits matmul, two biased accumulators.
    km = _feed(km_ref[0])
    vm = _feed(vm_ref[0])
    s_mod = jax.lax.dot_general(
        q, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    update(s_mod + (fg - 1.0) * -NEG_INF, mf_s, lf_s, accf_s, vm)
    update(s_mod + fg * NEG_INF, mb_s, lb_s, accb_s, vm)

    @pl.when(ki == nk - 1)
    def _():
        out_self = accs_s[:] / jnp.maximum(ls_s[:, 0], 1e-30)[:, None]
        out_fg = accf_s[:] / jnp.maximum(lf_s[:, 0], 1e-30)[:, None]
        out_bg = accb_s[:] / jnp.maximum(lb_s[:, 0], 1e-30)[:, None]
        tq = tq_ref[0][0][:, None]                # [BQ, 1] query composite
        cg = cg_ref[0, 0]                         # scalar from SMEM
        modulated = tq * out_fg + (1.0 - tq) * out_bg
        o_ref[0] = (cg * modulated + (1.0 - cg) * out_self).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_q", "block_k"))
def tca_flash(
    q: jnp.ndarray,
    k_self: jnp.ndarray,
    v_self: jnp.ndarray,
    k_mod: jnp.ndarray,
    v_mod: jnp.ndarray,
    fg_key_mask: jnp.ndarray,   # [B, S] keys allowed in the FG pass
    tq_mask: jnp.ndarray,       # [B, S] per-query composite weight
    context_guidance: jnp.ndarray,  # scalar blend (1.0 for pure mmsa)
    *,
    heads: int,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """Fused TCA: cg * (tq*attn_fg + (1-tq)*attn_bg) + (1-cg) * attn_self.

    attn_self uses (k_self, v_self); attn_fg/attn_bg use (k_mod, v_mod)
    restricted to fg / 1-fg keys.  All shapes [B, S, H*D]; returns same.
    """
    b, s, e = q.shape
    d = e // heads
    bq = _pick_block(s, block_q)
    bk = _pick_block(s, block_k)

    def split(x):
        return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, s, d)

    qh = split(q)
    ksh, vsh = split(k_self), split(v_self)
    kmh, vmh = split(k_mod), split(v_mod)
    fg = fg_key_mask.astype(jnp.float32)[:, None, :]  # [B, 1, S]
    tq = tq_mask.astype(jnp.float32)[:, None, :]      # [B, 1, S]
    cg = jnp.broadcast_to(
        jnp.asarray(context_guidance, jnp.float32), (1, 1)
    )
    scale = 1.0 / (d ** 0.5)

    grid = (b * heads, s // bq, s // bk)
    hh = heads
    out = pl.pallas_call(
        functools.partial(_tca_kernel, scale=scale),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda h, qi, ki: (h // hh, 0, ki)),
            pl.BlockSpec((1, 1, bq), lambda h, qi, ki: (h // hh, 0, qi)),
            pl.BlockSpec((1, 1), lambda h, qi, ki: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32), pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32), pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32), pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )(qh, ksh, vsh, kmh, vmh, fg, tq, cg)
    return out.reshape(b, heads, s, d).transpose(0, 2, 1, 3).reshape(b, s, e)


# ---------------------------------------------------------------------------
# Flash attention VJP (enables jax.grad through flash_sdpa)
# ---------------------------------------------------------------------------


def _flash_fwd_lse_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, m_s, l_s, acc_s,
    *, scale, use_mask,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, _M_INIT)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = _feed(q_ref[0])
    k = _feed(k_ref[0])
    v = _feed(v_ref[0])
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if use_mask:
        s = s + (mask_ref[0, 0][None, :] - 1.0) * -NEG_INF

    m_prev = m_s[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    corr = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None])
    l_s[:, 0] = l_s[:, 0] * corr + jnp.sum(p, axis=1)
    acc_s[:] = acc_s[:] * corr[:, None] + _pv(p, v)
    m_s[:, 0] = m_cur

    @pl.when(ki == nk - 1)
    def _():
        l = jnp.maximum(l_s[:, 0], 1e-30)
        o_ref[0] = (acc_s[:] / l[:, None]).astype(o_ref.dtype)
        lse_ref[0, :, 0] = m_s[:, 0] + jnp.log(l)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_s,
    *, scale, use_mask,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if use_mask:
        s = s + (mask_ref[0, 0][None, :] - 1.0) * -NEG_INF
    p = jnp.exp(s - lse_ref[0, :, 0][:, None])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0, :, 0][:, None])
    acc_s[:] = acc_s[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = acc_s[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_s, dv_s,
    *, scale, use_mask,
):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if use_mask:
        s = s + (mask_ref[0, 0][None, :] - 1.0) * -NEG_INF
    p = jnp.exp(s - lse_ref[0, :, 0][:, None])          # [BQ, BK]
    dv_s[:] = dv_s[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0, :, 0][:, None])
    dk_s[:] = dk_s[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[:].astype(dv_ref.dtype)


def _flash_heads(x, b, s, heads, d):
    return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, s, d)


def _flash_unheads(x, b, s, heads, d):
    return x.reshape(b, heads, s, d).transpose(0, 2, 1, 3).reshape(b, s, heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_sdpa_diff(q, k, v, key_mask, heads, block_q=512, block_k=512):
    """Differentiable flash attention (same semantics as flash_sdpa).

    key_mask must be an array ([B, Sk] 0/1) — pass all-ones for unmasked.
    The backward pass recomputes attention blockwise from the saved
    logsumexp (the standard flash backward), entirely in Pallas.

    Outside differentiation JAX calls this primal body, which routes to the
    plain single-output kernel — the residual-emitting forward (extra
    [BH, S, 1] logsumexp output) only runs under jax.grad/vjp."""
    return flash_sdpa(
        q, k, v, key_mask, heads=heads, block_q=block_q, block_k=block_k
    )


def _flash_fwd_lse(q, k, v, key_mask, heads, block_q, block_k):
    b, sq, e = q.shape
    sk = k.shape[1]
    d = e // heads
    bq = _pick_block(sq, block_q)
    bk = _pick_block(sk, block_k)
    qh = _flash_heads(q, b, sq, heads, d)
    kh = _flash_heads(k, b, sk, heads, d)
    vh = _flash_heads(v, b, sk, heads, d)
    mask = key_mask.astype(jnp.float32)[:, None, :]
    scale = 1.0 / (d ** 0.5)
    grid = (b * heads, sq // bq, sk // bk)
    hh = heads
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_lse_kernel, scale=scale, use_mask=True),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda h, qi, ki: (h // hh, 0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * heads, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * heads, sq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )(qh, kh, vh, mask)
    return _flash_unheads(out, b, sq, heads, d), lse


def _flash_sdpa_fwd(q, k, v, key_mask, heads, block_q, block_k):
    out, lse = _flash_fwd_lse(q, k, v, key_mask, heads, block_q, block_k)
    return out, (q, k, v, key_mask, out, lse)


def _flash_sdpa_bwd(heads, block_q, block_k, res, g):
    q, k, v, key_mask, out, lse = res
    b, sq, e = q.shape
    sk = k.shape[1]
    d = e // heads
    bq = _pick_block(sq, block_q)
    bk = _pick_block(sk, block_k)
    qh = _flash_heads(q, b, sq, heads, d)
    kh = _flash_heads(k, b, sk, heads, d)
    vh = _flash_heads(v, b, sk, heads, d)
    doh = _flash_heads(g.astype(q.dtype), b, sq, heads, d)
    oh = _flash_heads(out, b, sq, heads, d)
    mask = key_mask.astype(jnp.float32)[:, None, :]
    scale = 1.0 / (d ** 0.5)
    hh = heads
    interp = jax.default_backend() != "tpu"

    delta = jnp.sum(
        oh.astype(jnp.float32) * doh.astype(jnp.float32), axis=-1, keepdims=True
    )  # [BH, Sq, 1]

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, use_mask=True),
        interpret=interp,
        grid=(b * heads, sq // bq, sk // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda h, qi, ki: (h // hh, 0, ki)),
            pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )(qh, kh, vh, mask, doh, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, use_mask=True),
        interpret=interp,
        grid=(b * heads, sk // bk, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, ki, qi: (h, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
            pl.BlockSpec((1, 1, bk), lambda h, ki, qi: (h // hh, 0, ki)),
            pl.BlockSpec((1, bq, d), lambda h, ki, qi: (h, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * heads, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * heads, sk, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
    )(qh, kh, vh, mask, doh, lse, delta)

    return (
        _flash_unheads(dq, b, sq, heads, d),
        _flash_unheads(dk, b, sk, heads, d),
        _flash_unheads(dv, b, sk, heads, d),
        jnp.zeros_like(key_mask),
    )


flash_sdpa_diff.defvjp(_flash_sdpa_fwd, _flash_sdpa_bwd)


# ---------------------------------------------------------------------------
# Fused TCA VJP: differentiable three-attention composite
# ---------------------------------------------------------------------------


def _tca_fwd_lse_kernel(
    q_ref, ks_ref, vs_ref, km_ref, vm_ref, fg_ref, tq_ref, cg_ref,
    o_ref, os_ref, of_ref, ob_ref, lses_ref, lsef_ref, lseb_ref,
    ms_s, ls_s, accs_s, mf_s, lf_s, accf_s, mb_s, lb_s, accb_s,
    *, scale,
):
    """Forward TCA emitting the composite plus the three partial outputs and
    their logsumexps (residuals for the flash backward)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        for m in (ms_s, mf_s, mb_s):
            m[:] = jnp.full_like(m, _M_INIT)
        for l in (ls_s, lf_s, lb_s):
            l[:] = jnp.zeros_like(l)
        for a in (accs_s, accf_s, accb_s):
            a[:] = jnp.zeros_like(a)

    q = _feed(q_ref[0])
    fg = fg_ref[0, 0][None, :]

    def update(s, m_s, l_s, acc_s, v):
        m_prev = m_s[:, 0]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        corr = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_s[:, 0] = l_s[:, 0] * corr + jnp.sum(p, axis=1)
        acc_s[:] = acc_s[:] * corr[:, None] + _pv(p, v)
        m_s[:, 0] = m_cur

    ks = _feed(ks_ref[0])
    vs = _feed(vs_ref[0])
    s_self = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    update(s_self, ms_s, ls_s, accs_s, vs)

    km = _feed(km_ref[0])
    vm = _feed(vm_ref[0])
    s_mod = jax.lax.dot_general(
        q, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    update(s_mod + (fg - 1.0) * -NEG_INF, mf_s, lf_s, accf_s, vm)
    update(s_mod + fg * NEG_INF, mb_s, lb_s, accb_s, vm)

    @pl.when(ki == nk - 1)
    def _():
        l_se = jnp.maximum(ls_s[:, 0], 1e-30)
        l_fg = jnp.maximum(lf_s[:, 0], 1e-30)
        l_bg = jnp.maximum(lb_s[:, 0], 1e-30)
        out_self = accs_s[:] / l_se[:, None]
        out_fg = accf_s[:] / l_fg[:, None]
        out_bg = accb_s[:] / l_bg[:, None]
        tq = tq_ref[0][0][:, None]
        cg = cg_ref[0, 0]
        modulated = tq * out_fg + (1.0 - tq) * out_bg
        o_ref[0] = (cg * modulated + (1.0 - cg) * out_self).astype(o_ref.dtype)
        os_ref[0] = out_self.astype(os_ref.dtype)
        of_ref[0] = out_fg.astype(of_ref.dtype)
        ob_ref[0] = out_bg.astype(ob_ref.dtype)
        lses_ref[0, :, 0] = ms_s[:, 0] + jnp.log(l_se)
        lsef_ref[0, :, 0] = mf_s[:, 0] + jnp.log(l_fg)
        lseb_ref[0, :, 0] = mb_s[:, 0] + jnp.log(l_bg)


def _tca_bwd_dq_kernel(
    q_ref, ks_ref, vs_ref, km_ref, vm_ref, fg_ref, tq_ref, cg_ref, do_ref,
    lses_ref, lsef_ref, lseb_ref, ds_ref, df_ref, db_ref,
    dq_ref, acc_s,
    *, scale,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    fg = fg_ref[0, 0][None, :]
    tq = tq_ref[0][0][:, None]
    cg = cg_ref[0, 0]
    do_self = (1.0 - cg) * do
    do_fg = (cg * tq) * do
    do_bg = (cg * (1.0 - tq)) * do

    ks = _feed(ks_ref[0])
    vs = _feed(vs_ref[0])
    s_self = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p_self = jnp.exp(s_self - lses_ref[0, :, 0][:, None])
    dp = jax.lax.dot_general(
        do_self, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p_self * (dp - ds_ref[0, :, 0][:, None])
    acc_s[:] = acc_s[:] + jax.lax.dot_general(
        ds, ks, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    km = _feed(km_ref[0])
    vm = _feed(vm_ref[0])
    s_mod = jax.lax.dot_general(
        q, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dp_m = jax.lax.dot_general(
        do_fg, vm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p_fg = jnp.exp(s_mod + (fg - 1.0) * -NEG_INF - lsef_ref[0, :, 0][:, None])
    ds_m = p_fg * (dp_m - df_ref[0, :, 0][:, None])
    dp_b = jax.lax.dot_general(
        do_bg, vm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p_bg = jnp.exp(s_mod + fg * NEG_INF - lseb_ref[0, :, 0][:, None])
    ds_m = ds_m + p_bg * (dp_b - db_ref[0, :, 0][:, None])
    acc_s[:] = acc_s[:] + jax.lax.dot_general(
        ds_m, km, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = acc_s[:].astype(dq_ref.dtype)


def _tca_bwd_dkv_kernel(
    q_ref, ks_ref, vs_ref, km_ref, vm_ref, fg_ref, tq_ref, cg_ref, do_ref,
    lses_ref, lsef_ref, lseb_ref, ds_ref, df_ref, db_ref,
    dks_ref, dvs_ref, dkm_ref, dvm_ref,
    dks_s, dvs_s, dkm_s, dvm_s,
    *, scale,
):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        for s in (dks_s, dvs_s, dkm_s, dvm_s):
            s[:] = jnp.zeros_like(s)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    fg = fg_ref[0, 0][None, :]
    tq = tq_ref[0][0][:, None]
    cg = cg_ref[0, 0]
    do_self = (1.0 - cg) * do
    do_fg = (cg * tq) * do
    do_bg = (cg * (1.0 - tq)) * do

    ks = _feed(ks_ref[0])
    vs = _feed(vs_ref[0])
    s_self = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p_self = jnp.exp(s_self - lses_ref[0, :, 0][:, None])
    dvs_s[:] = dvs_s[:] + jax.lax.dot_general(
        p_self, do_self, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_self, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p_self * (dp - ds_ref[0, :, 0][:, None])
    dks_s[:] = dks_s[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    km = _feed(km_ref[0])
    vm = _feed(vm_ref[0])
    s_mod = jax.lax.dot_general(
        q, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p_fg = jnp.exp(s_mod + (fg - 1.0) * -NEG_INF - lsef_ref[0, :, 0][:, None])
    p_bg = jnp.exp(s_mod + fg * NEG_INF - lseb_ref[0, :, 0][:, None])
    dvm_s[:] = dvm_s[:] + jax.lax.dot_general(
        p_fg, do_fg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        p_bg, do_bg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_m = jax.lax.dot_general(
        do_fg, vm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_m = p_fg * (dp_m - df_ref[0, :, 0][:, None])
    dp_b = jax.lax.dot_general(
        do_bg, vm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_m = ds_m + p_bg * (dp_b - db_ref[0, :, 0][:, None])
    dkm_s[:] = dkm_s[:] + jax.lax.dot_general(
        ds_m, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(qi == nq - 1)
    def _():
        dks_ref[0] = dks_s[:].astype(dks_ref.dtype)
        dvs_ref[0] = dvs_s[:].astype(dvs_ref.dtype)
        dkm_ref[0] = dkm_s[:].astype(dkm_ref.dtype)
        dvm_ref[0] = dvm_s[:].astype(dvm_ref.dtype)


def _tca_prep(q, k_self, v_self, k_mod, v_mod, fg, tq, cg, heads, block_q,
              block_k):
    b, s, e = q.shape
    d = e // heads
    bq = _pick_block(s, block_q)
    bk = _pick_block(s, block_k)
    split = lambda x: _flash_heads(x, b, s, heads, d)  # noqa: E731
    arrs = tuple(split(x) for x in (q, k_self, v_self, k_mod, v_mod))
    fgm = fg.astype(jnp.float32)[:, None, :]
    tqm = tq.astype(jnp.float32)[:, None, :]
    cgm = jnp.broadcast_to(jnp.asarray(cg, jnp.float32), (1, 1))
    return arrs, fgm, tqm, cgm, (b, s, e, d, bq, bk)


def _tca_in_specs(heads, bq, bk, d):
    hh = heads
    return [
        pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
        pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
        pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
        pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
        pl.BlockSpec((1, bk, d), lambda h, qi, ki: (h, ki, 0)),
        pl.BlockSpec((1, 1, bk), lambda h, qi, ki: (h // hh, 0, ki)),
        pl.BlockSpec((1, 1, bq), lambda h, qi, ki: (h // hh, 0, qi)),
        pl.BlockSpec((1, 1), lambda h, qi, ki: (0, 0), memory_space=pltpu.SMEM),
    ]


def _tca_fwd_lse(q, k_self, v_self, k_mod, v_mod, fg, tq, cg, heads,
                 block_q, block_k):
    arrs, fgm, tqm, cgm, (b, s, e, d, bq, bk) = _tca_prep(
        q, k_self, v_self, k_mod, v_mod, fg, tq, cg, heads, block_q, block_k
    )
    scale = 1.0 / (d ** 0.5)
    grid = (b * heads, s // bq, s // bk)
    o_spec = pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0))
    l_spec = pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0))
    od = jax.ShapeDtypeStruct((b * heads, s, d), q.dtype)
    of32 = jax.ShapeDtypeStruct((b * heads, s, d), jnp.float32)
    lse = jax.ShapeDtypeStruct((b * heads, s, 1), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_tca_fwd_lse_kernel, scale=scale),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=_tca_in_specs(heads, bq, bk, d),
        out_specs=(o_spec, o_spec, o_spec, o_spec, l_spec, l_spec, l_spec),
        out_shape=(od, of32, of32, of32, lse, lse, lse),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32), pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32), pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32), pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )(*arrs, fgm, tqm, cgm)
    o = _flash_unheads(outs[0], b, s, heads, d)
    return o, outs[1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def tca_flash_diff(q, k_self, v_self, k_mod, v_mod, fg_key_mask, tq_mask,
                   context_guidance, heads, block_q=512, block_k=512):
    """Differentiable fused TCA (same semantics as `tca_flash`).

    The backward pass recomputes all three attention matrices blockwise from
    the saved per-pass logsumexps and accumulates dq / d(k,v)_self /
    d(k,v)_mod in two Pallas kernels; masks and the guidance scalar get zero
    gradients (they are schedule data, not learnable).

    Outside differentiation JAX calls this primal body, which routes to the
    single-output forward kernel — the residual-emitting forward (3 extra
    [BH,S,D] f32 outputs + 3 logsumexps) only runs under jax.grad/vjp."""
    return tca_flash(
        q, k_self, v_self, k_mod, v_mod, fg_key_mask, tq_mask,
        context_guidance, heads=heads, block_q=block_q, block_k=block_k,
    )


def _tca_diff_fwd(q, k_self, v_self, k_mod, v_mod, fg, tq, cg, heads,
                  block_q, block_k):
    out, (o_self, o_fg, o_bg, lse_s, lse_f, lse_b) = _tca_fwd_lse(
        q, k_self, v_self, k_mod, v_mod, fg, tq, cg, heads, block_q, block_k
    )
    res = (q, k_self, v_self, k_mod, v_mod, fg, tq, cg,
           o_self, o_fg, o_bg, lse_s, lse_f, lse_b)
    return out, res


def _tca_diff_bwd(heads, block_q, block_k, res, g):
    (q, k_self, v_self, k_mod, v_mod, fg, tq, cg,
     o_self, o_fg, o_bg, lse_s, lse_f, lse_b) = res
    arrs, fgm, tqm, cgm, (b, s, e, d, bq, bk) = _tca_prep(
        q, k_self, v_self, k_mod, v_mod, fg, tq, cg, heads, block_q, block_k
    )
    qh, ksh, vsh, kmh, vmh = arrs
    doh = _flash_heads(g.astype(q.dtype), b, s, heads, d)
    scale = 1.0 / (d ** 0.5)
    interp = jax.default_backend() != "tpu"

    # Weighted per-pass deltas: delta_x = rowsum(o_x * do_x) with
    # do_self = (1-cg) g, do_fg = cg*tq*g, do_bg = cg*(1-tq)*g.
    do32 = doh.astype(jnp.float32)
    cg32 = jnp.asarray(cg, jnp.float32)
    tqh = jnp.repeat(tq.astype(jnp.float32), heads, axis=0)[:, :, None]
    d_self = jnp.sum(o_self * do32, -1, keepdims=True) * (1.0 - cg32)
    d_fg = jnp.sum(o_fg * do32, -1, keepdims=True) * (cg32 * tqh)
    d_bg = jnp.sum(o_bg * do32, -1, keepdims=True) * (cg32 * (1.0 - tqh))

    in_specs = _tca_in_specs(heads, bq, bk, d) + [
        pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),   # do
        pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),   # lse_s
        pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),   # lse_f
        pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),   # lse_b
        pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),   # d_self
        pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),   # d_fg
        pl.BlockSpec((1, bq, 1), lambda h, qi, ki: (h, qi, 0)),   # d_bg
    ]
    args = (qh, ksh, vsh, kmh, vmh, fgm, tqm, cgm, doh,
            lse_s, lse_f, lse_b, d_self, d_fg, d_bg)

    dq = pl.pallas_call(
        functools.partial(_tca_bwd_dq_kernel, scale=scale),
        interpret=interp,
        grid=(b * heads, s // bq, s // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda h, qi, ki: (h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * heads, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )(*args)

    # dkv sweep: grid loops queries innermost; swap the (qi, ki) roles in the
    # index maps (block row = ki).
    hh = heads
    kv_in_specs = [
        pl.BlockSpec((1, bq, d), lambda h, ki, qi: (h, qi, 0)),
        pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
        pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
        pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
        pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0)),
        pl.BlockSpec((1, 1, bk), lambda h, ki, qi: (h // hh, 0, ki)),
        pl.BlockSpec((1, 1, bq), lambda h, ki, qi: (h // hh, 0, qi)),
        pl.BlockSpec((1, 1), lambda h, ki, qi: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, bq, d), lambda h, ki, qi: (h, qi, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, ki, qi: (h, qi, 0)),
    ]
    kv_spec = pl.BlockSpec((1, bk, d), lambda h, ki, qi: (h, ki, 0))
    kv_shape = jax.ShapeDtypeStruct((b * heads, s, d), k_self.dtype)
    dks, dvs, dkm, dvm = pl.pallas_call(
        functools.partial(_tca_bwd_dkv_kernel, scale=scale),
        interpret=interp,
        grid=(b * heads, s // bk, s // bq),
        in_specs=kv_in_specs,
        out_specs=(kv_spec, kv_spec, kv_spec, kv_spec),
        out_shape=(kv_shape, kv_shape, kv_shape, kv_shape),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32), pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32), pltpu.VMEM((bk, d), jnp.float32),
        ],
    )(*args)

    unh = lambda x: _flash_unheads(x, b, s, heads, d)  # noqa: E731
    return (
        unh(dq), unh(dks), unh(dvs), unh(dkm), unh(dvm),
        jnp.zeros_like(fg), jnp.zeros_like(tq),
        jnp.zeros_like(jnp.asarray(cg, jnp.float32)),
    )


tca_flash_diff.defvjp(_tca_diff_fwd, _tca_diff_bwd)
