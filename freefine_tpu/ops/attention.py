"""Edit-aware attention: the functional core of FreeFine-TPU.

Reimplements the semantics of the reference `Attention_Modulator`
(/root/reference/src/utils/attention.py:640-1445) as pure functions over
``[B, S, H*D]`` query/key/value projections plus an (EditConfig, EditState)
pair.  Design differences from the reference (all TPU-motivated):

  * No dense ``seq x seq`` masks.  Every reference mask is separable into a
    per-key vector (which keys may be attended) and a per-query vector (which
    queries take the modulated output).  Key masks become rank-1 additive
    biases on the attention logits; query masks become output blends.  This
    removes the O(S^2) mask materialisation of
    `prepare_various_attention_mask` (attention.py:862-889).
  * Stream routing (K/V replacement / append) is a static gather on the batch
    axis — free at trace time, no data movement beyond what XLA schedules.
  * Softmax always accumulates in float32 (the bf16-on-MXU analogue of the
    reference's `upcast_attention`/`upcast_softmax` flags,
    attention.py:776-806).
  * One fused graph per (mode, method): all per-step variability
    (context_guidance, share_gate, masks) is traced data, so a full denoise
    loop compiles into a single `lax.scan`.

All functions take q, k, v of shape ``[B, S, E]`` with ``E = heads * head_dim``
and return ``[B, Sq, E]``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from freefine_tpu.edit import EditConfig, EditState

# Finite stand-in for -inf: keeps softmax well-defined when an entire row is
# masked (torch's `finfo.min` fill degrades to uniform attention there, which
# this matches; true -inf would produce NaNs).
NEG_INF = -1e9

# Flash-kernel routing: 'auto' uses Pallas on TPU for long sequences and the
# einsum path elsewhere; '1' forces Pallas (interpret mode off-TPU, used by
# the golden tests); '0' forces einsum.
FLASH_MODE = os.environ.get("FREEFINE_FLASH", "auto")
FLASH_MIN_SEQ = 256

# Einsum-path matmul feed precision, shared convention with the Pallas
# kernels (ops/flash_attention.py): 'bf16' (default) keeps bf16 operands on
# the MXU with f32 accumulation; 'f32' upcasts first (bit-stable golden
# path).  Only affects bf16 inputs — f32 inputs are unchanged either way.
_COMPUTE_BF16 = os.environ.get("FREEFINE_FLASH_COMPUTE", "bf16") != "f32"


_FLASH_SUSPENDED = False


def _use_flash(*seqs: int) -> bool:
    if _FLASH_SUSPENDED or FLASH_MODE == "0":
        return False
    if FLASH_MODE == "1":
        return True
    return jax.default_backend() == "tpu" and all(
        s >= FLASH_MIN_SEQ and s % 128 == 0 for s in seqs
    )


class flash_suspended:
    """Trace-time context that forces the einsum attention path.

    Every Pallas attention kernel now has a custom VJP (`flash_sdpa_diff`,
    `tca_flash_diff`), so differentiated graphs — energy guidance's jax.grad
    through the UNet, ops/guidance.py — keep the flash kernels.  This
    context remains as a debugging escape hatch (einsum golden path)."""

    def __enter__(self):
        global _FLASH_SUSPENDED
        self._prev = _FLASH_SUSPENDED
        _FLASH_SUSPENDED = True

    def __exit__(self, *exc):
        global _FLASH_SUSPENDED
        _FLASH_SUSPENDED = self._prev


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, S, H*D] -> [B, H, S, D]."""
    b, s, e = x.shape
    return x.reshape(b, s, heads, e // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, D] -> [B, S, H*D]."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def key_bias(key_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-key 0/1 mask -> additive bias broadcastable over (heads, queries).

    [B, Sk] -> [B, 1, 1, Sk];  0 -> NEG_INF, 1 -> 0  (reference
    `post_process_attn_mask`, attention.py:856-860).
    """
    return (key_mask[:, None, None, :] - 1.0) * -NEG_INF


def attention_probs(q: jnp.ndarray, k: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Head-averaged softmax attention probabilities [B, Sq, Sk] in f32 —
    the quantity the reference AttentionStore records (attention.py:601-638).

    Documented deviation: the reference stores head-resolved [B*H, S, S]
    maps; averaging over heads here bounds the instrument's memory (the
    prompt-to-prompt-style consumers average heads anyway)."""
    qh = split_heads(q, heads).astype(jnp.float32)
    kh = split_heads(k, heads).astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(qh.shape[-1]))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    return jax.nn.softmax(logits, axis=-1).mean(axis=1)


def token_attention_maps(
    q: jnp.ndarray, k: jnp.ndarray, heads: int, token_select: jnp.ndarray
) -> jnp.ndarray:
    """Head-resolved cross-attn probabilities reduced to selected tokens.

    q [B, Sq, E], k [B, Sk, E], token_select [T, Sk] (one-hot rows; zero rows
    are padding) -> [B*H, Sq, T] float32.  The SelfGuidance baseline's
    attention storage (free_guidance.py:384-405) reduced at the source: only
    the edited object's token maps ever leave the layer, so the sown
    residuals stay O(S) instead of O(S x 77).
    """
    qh = split_heads(q, heads).astype(jnp.float32)
    kh = split_heads(k, heads).astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(qh.shape[-1]))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    sel = jnp.einsum("bhqk,tk->bhqt", probs, token_select.astype(jnp.float32))
    b, h, s, t = sel.shape
    return sel.reshape(b * h, s, t)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with f32 logits/softmax accumulation.

    q: [B, Sq, E], k/v: [B, Sk, E], bias broadcastable to [B, H, Sq, Sk].
    With the default bf16 feed, bf16 operands hit the MXU natively and the
    logits/softmax still accumulate in f32.
    """
    dtype = q.dtype
    qh = split_heads(q, heads)
    kh = split_heads(k, heads)
    vh = split_heads(v, heads)
    if not _COMPUTE_BF16:
        qh = qh.astype(jnp.float32)
        kh = kh.astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(qh.shape[-1]))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32
    )
    return merge_heads(out).astype(dtype)


# Sequence-parallel serving hook (parallel/serve.py): when a mesh is
# registered, long self-attention sequences route through
# sp.sequence_parallel_sdpa — the token axis sharded over 'model', K/V and
# mask rows allgathered over ICI.  (mesh, model_axis, min_seq) or None.
_SP_SERVING = None
_SP_ACTIVE = False  # re-entry guard: the per-shard body calls masked_sdpa


def set_sequence_parallel(mesh, model_axis: str = "model",
                          min_seq: int = 2048) -> None:
    """Enable (mesh is not None) or disable (None) sequence-parallel
    routing of `masked_sdpa` for self-attention with seq >= min_seq.
    Production entry: FreeFine.use_mesh(..., sequence_parallel=True)."""
    global _SP_SERVING
    _SP_SERVING = None if mesh is None else (mesh, model_axis, min_seq)


def _maybe_sequence_parallel(q, k, v, heads, key_rows):
    """Route through parallel.sp when registered and applicable."""
    global _SP_ACTIVE
    if _SP_SERVING is None or _SP_ACTIVE:
        return None
    mesh, axis, min_seq = _SP_SERVING
    n = mesh.shape[axis]
    sq, sk = q.shape[1], k.shape[1]
    if sq < min_seq or sq != sk or sq % n or sk % n or n == 1:
        return None
    from freefine_tpu.parallel import sp

    _SP_ACTIVE = True
    try:
        return sp.sequence_parallel_sdpa(
            q, k, v, heads, mesh, key_rows=key_rows, model_axis=axis
        )
    finally:
        _SP_ACTIVE = False


def masked_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    key_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention with an optional per-key [B, Sk] 0/1 mask.

    Routes to the Pallas flash kernel on TPU (O(S) memory, fused bias),
    einsum elsewhere — both numerically equivalent (golden-tested).  Under
    a registered serving mesh (`set_sequence_parallel`), long sequences
    shard the token axis over the 'model' axis first (parallel/sp.py).
    """
    sp_out = _maybe_sequence_parallel(q, k, v, heads, key_rows)
    if sp_out is not None:
        return sp_out
    sq, sk = q.shape[1], k.shape[1]
    pad_q, pad_k = (-sq) % 128, (-sk) % 128
    if _use_flash(sq + pad_q, sk + pad_k):
        from freefine_tpu.ops.flash_attention import flash_sdpa_diff

        rows = (
            jnp.ones((q.shape[0], sk), jnp.float32)
            if key_rows is None else key_rows
        )
        if pad_q or pad_k:
            # Non-128-multiple sequences (e.g. SV3D's 72x72 = 5184 spatial
            # tokens) ride the flash kernel too: pad to the lane multiple,
            # mask the padded keys via the kernel's per-key rows, slice the
            # padded queries back off.  O(S) memory either way — the dense
            # einsum fallback at these lengths materialises S^2 logits.
            q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
            rows = jnp.pad(rows, ((0, 0), (0, pad_k)))
            return flash_sdpa_diff(q, k, v, rows, heads)[:, :sq]
        # the differentiable variant (custom VJP) so jax.grad works through
        # the kernel (energy guidance); forward math is identical
        return flash_sdpa_diff(q, k, v, rows, heads)
    bias = None if key_rows is None else key_bias(key_rows)
    return sdpa(q, k, v, heads, bias)


def _tca_fused(
    q, k_self, v_self, k_mod, v_mod, fg_rows, tq_rows, ecg, heads
) -> Optional[jnp.ndarray]:
    """Fused TCA path: ecg*(tq*attn_fg + (1-tq)*attn_bg) + (1-ecg)*self.

    Returns None when the flash kernel is not applicable (then callers use
    the einsum composite).  Routes through the custom-VJP variant so graphs
    that differentiate through TCA (energy-guided editing) keep Pallas —
    outside differentiation its primal body is the single-output kernel."""
    if not _use_flash(q.shape[1]):
        return None
    from freefine_tpu.ops.flash_attention import tca_flash_diff

    return tca_flash_diff(
        q, k_self, v_self, k_mod, v_mod, fg_rows, tq_rows,
        jnp.asarray(ecg, jnp.float32), heads,
    )


# Stream index of the reference K/V source per edit-layout batch size:
#   4-stream [u_e, u_r, c_e, c_r] -> [u_r, u_r, c_r, c_r]  (legacy, matches
#     the reference batch layout, model.py:536-564);
#   3-stream [u_e, r, c_e]        -> [r, r, r]  (deduped: the reference
#     stream's uncond and cond passes are identical — same latent, same ""
#     prompt — so one shared stream serves both CFG halves; see
#     sample_edit_loop and tests/test_stream_dedup.py);
#   1-stream [r]                  -> [r]  (standalone reference pass: the
#     gather is the identity, so the stream runs the reference streams'
#     even-head self-modulation).
_REF_GATHER = {1: (0,), 3: (1, 1, 1), 4: (1, 1, 3, 3)}

# Which streams are *edit* streams per layout (1 = edit, 0 = reference).
# Only consulted under EditConfig.ref_vanilla — with reference-exact
# head-parity masks the pattern is stream-independent.
_EDIT_STREAMS = {1: (0,), 3: (1, 0, 1), 4: (1, 0, 1, 0)}


def _ref_stream_gather(x: jnp.ndarray) -> jnp.ndarray:
    """K/V replacement for the edit/bggen stream layouts (reference
    `cross_manner_attention_modulate`, attention.py:1033-1035: every stream
    attends to the *reference* stream of its CFG half)."""
    if x.shape[0] not in _REF_GATHER:
        raise ValueError(
            f"edit/bggen attention expects the deduped 3-stream [u_e, r, "
            f"c_e] or legacy 4-stream [u_e, u_r, c_e, c_r] batch layout, "
            f"got batch {x.shape[0]}"
        )
    return x[jnp.array(_REF_GATHER[x.shape[0]])]


def _edit_rows(per_token: jnp.ndarray, b: int) -> jnp.ndarray:
    """[S] mask -> [B, S]: applied to the edit streams, ones for the
    reference stream(s).  B = 4 legacy layout, 3 deduped layout.

    Used by the *intent*-semantics rows (EditConfig.ref_vanilla) and by the
    kernel-composite tests; the reference-exact default builds head-parity
    rows instead (`_parity_rows`)."""
    ones = jnp.ones_like(per_token)
    try:
        rows = [per_token if e else ones for e in _EDIT_STREAMS[b]]
    except KeyError:
        raise ValueError(
            f"edit/bggen attention expects the deduped 3-stream or legacy "
            f"4-stream batch layout, got batch {b}"
        ) from None
    return jnp.stack(rows)


# -- head-parity mask layout (reference-exact) ------------------------------
#
# The reference builds its attention masks per-stream but consumes them per
# (batch*head) row after torch `.repeat(heads, ...)` TILES the 4-row
# [m, 1, m, 1] pattern, while `head_to_batch_dim` orders rows batch-major
# (row = b*H + h).  With H even the row index mod 4 collapses to h mod 2:
# *even heads* take the masked/modulated path and *odd heads* unmasked
# reference-key attention — in every stream, independent of b (the classic
# diffusers repeat-vs-repeat_interleave mask bug; attention.py:856-860,
# 884-897, verified bit-for-bit in tests/test_reference_golden.py).
#
# We express this by regrouping heads into two virtual batch blocks
# ([even-head streams; odd-head streams] = [2B, S, E/2]) so the existing
# rank-1 per-row mask machinery and the fused Pallas kernel apply unchanged.


def _split_parity(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, S, H*D] -> [2B, S, (H/2)*D]: even-head halves then odd-head
    halves stacked on the batch axis.  Exact — attention is head-diagonal."""
    b, s, e = x.shape
    d = e // heads
    xh = x.reshape(b, s, heads // 2, 2, d)
    return jnp.concatenate(
        [xh[:, :, :, 0].reshape(b, s, -1), xh[:, :, :, 1].reshape(b, s, -1)],
        axis=0,
    )


def _merge_parity(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Inverse of `_split_parity`: [2B, S, (H/2)*D] -> [B, S, H*D]."""
    b2, s, e2 = x.shape
    b = b2 // 2
    d = e2 // (heads // 2)
    xe = x[:b].reshape(b, s, heads // 2, 1, d)
    xo = x[b:].reshape(b, s, heads // 2, 1, d)
    return jnp.concatenate([xe, xo], axis=3).reshape(b, s, -1)


def _parity_rows(
    per_token: jnp.ndarray, b: int, edit_only: bool = False
) -> jnp.ndarray:
    """[S] mask -> [2B, S] rows for the parity-split layout: the even-head
    block is masked, the odd-head block unmasked.

    edit_only (EditConfig.ref_vanilla): mask only the edit streams' even
    heads, reference streams stay fully unmasked (intent semantics — the
    shared-source lane's contract)."""
    ones = jnp.ones_like(per_token)
    if edit_only:
        even = jnp.stack(
            [per_token if e else ones for e in _EDIT_STREAMS[b]]
        )
    else:
        even = jnp.tile(per_token[None], (b, 1))
    return jnp.concatenate([even, jnp.tile(ones[None], (b, 1))], axis=0)


def _check_parity_heads(heads: int) -> None:
    if heads % 2:
        raise ValueError(
            "reference-exact TCA/SDSA masking is head-parity-interleaved "
            f"(see _parity_rows) and requires an even head count, got "
            f"{heads}.  All editing backbones (SD-1.5/SDXL/DiT) use even "
            "head counts at their attention resolutions."
        )


# ---------------------------------------------------------------------------
# Self-attention dispatch
# ---------------------------------------------------------------------------


def edit_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    cfg: EditConfig,
    state: Optional[EditState],
    block_index: int,
    place: str,
) -> jnp.ndarray:
    """Dispatch self-attention according to the editing mode.

    Mirrors the dispatcher in `register_attention_control*`
    (attention.py:342-452, 226-339, 454-564).
    """
    if cfg.mode == "drag":
        # Stream-K/V replacement: every stream attends with stream
        # `cfg.kv_source_stream`'s K/V, gated by layer range / place and the
        # per-step share_gate.  Covers two baseline mechanisms:
        #   * RegionDrag's to_k/to_v record-then-paste hooks
        #     (RegionDrag/region_utils/drag.py:195-215): source stream 1
        #     (the hook latent), all layers, all steps;
        #   * DragDiffusion's MasaCtrl mutual self-attention
        #     (DragDiffusion/utils/attn_utils.py:44-98): source stream 0
        #     (the un-dragged branch), layers 10-15, steps >= 4.
        if place not in cfg.tca_scope or not cfg.block_gated(block_index):
            return masked_sdpa(q, k, v, heads)
        idx = jnp.full((k.shape[0],), cfg.kv_source_stream, jnp.int32)
        kc, vc = k[idx], v[idx]
        if state is not None:
            g = state.share_gate
            kc = jnp.where(g > 0, kc, k)
            vc = jnp.where(g > 0, vc, v)
        return masked_sdpa(q, kc, vc, heads)

    if cfg.mode == "none" or cfg.method is None or state is None:
        return masked_sdpa(q, k, v, heads)

    if cfg.uses_share_attention:
        if place not in cfg.style_align_scope or cfg.mode == "compose":
            return masked_sdpa(q, k, v, heads)
        return _style_align_attention(q, k, v, heads, cfg, state)

    # tca / mmsa
    if place not in cfg.tca_scope or not cfg.block_gated(block_index):
        return masked_sdpa(q, k, v, heads)

    if cfg.mode == "edit":
        return _tca_edit(q, k, v, heads, cfg, state, block_index)
    if cfg.mode == "bggen":
        return _tca_bggen(q, k, v, heads, cfg, state, block_index)
    if cfg.mode == "compose":
        return _tca_compose(q, k, v, heads, cfg, state)
    raise ValueError(cfg.mode)


def _blend_with_self(
    modulated: jnp.ndarray,
    self_h: jnp.ndarray,
    cfg: EditConfig,
    state: EditState,
) -> jnp.ndarray:
    """Apply the tca context_guidance blend / mmsa share gate.

    tca  : out = cg * modulated + (1 - cg) * self      (attention.py:1083)
    mmsa : out = modulated  (share_gate handles mmsa_es's hard cut-off,
           model.py:589-591, as a traced 0/1 scalar).
    """
    ecg = _effective_cg(cfg, state)
    out = ecg * modulated.astype(jnp.float32) + (1.0 - ecg) * self_h.astype(
        jnp.float32
    )
    return out.astype(self_h.dtype)


def _effective_cg(cfg: EditConfig, state: EditState) -> jnp.ndarray:
    """Collapse the tca context_guidance blend and the mmsa_es share gate
    into one coefficient on the modulated output:
      out = ecg * modulated + (1 - ecg) * self
    with ecg = share_gate * context_guidance (tca) or share_gate (mmsa)."""
    cg = state.context_guidance if cfg.method == "tca" else jnp.float32(1.0)
    return state.share_gate * cg


def _tca_edit(q, k, v, heads, cfg, state, block_index=None):
    """Temporal-contextual attention, edit mode (attention.py:1043-1091).

    Streams [u_e, u_r, c_e, c_r]; every stream attends to the reference
    stream of its CFG half (cross_manner_attention_modulate).  Per the
    reference's head-parity mask consumption (see `_parity_rows`): even
    heads composite an FG-restricted and a BG-restricted reference
    attention by the target mask, odd heads take unmasked reference-key
    attention; both blend with vanilla self-attention by context_guidance.
    For the reference streams the gathered keys are their own, so they run
    the same even-head self-modulation (vanilla under cfg.ref_vanilla).

    Shared-reference layout (cfg.shared_ref): streams are [u_e, c_e] and the
    reference K/V come from state.ref_kv[block_index] — captured once per
    step from a standalone (vanilla, i.e. ref_vanilla-semantics) reference
    pass and shared across all same-source cases.
    """
    _check_parity_heads(heads)
    b, seq, _ = q.shape
    fg_ref = state.fg_ref[seq]          # [S] source-object key mask
    tgt = state.fg_retain[seq]          # [S] target-region query mask

    if cfg.shared_ref:
        assert state.ref_kv is not None and block_index in state.ref_kv, (
            "shared_ref layout needs EditState.ref_kv captured at every "
            f"TCA-gated layer (missing block {block_index})"
        )
        rk, rv = state.ref_kv[block_index]
        kc = jnp.broadcast_to(rk[None].astype(k.dtype), k.shape)
        vc = jnp.broadcast_to(rv[None].astype(v.dtype), v.shape)
        edit_only = False               # both streams are edit streams
    else:
        kc = _ref_stream_gather(k)
        vc = _ref_stream_gather(v)
        edit_only = cfg.ref_vanilla
    if cfg.method == "tca":
        tgt = (tgt > 0).astype(jnp.float32)  # binarised (attention.py:1071)

    qp, kp, vp = (_split_parity(x, heads) for x in (q, k, v))
    kcp, vcp = _split_parity(kc, heads), _split_parity(vc, heads)
    rows_fg = _parity_rows(fg_ref, b, edit_only)
    rows_tgt = _parity_rows(tgt, b, edit_only)
    ecg = _effective_cg(cfg, state)

    fused = _tca_fused(qp, kp, vp, kcp, vcp, rows_fg, rows_tgt,
                       ecg, heads // 2)
    if fused is not None:
        return _merge_parity(fused, heads)

    # Unmasked (all-ones) rows stay unmasked on the BG side too: their
    # blend weight (1 - tq) is zero, but the softmax stays well-posed.
    rows_bg = _parity_rows(1.0 - fg_ref, b, edit_only)
    attn_fg = sdpa(qp, kcp, vcp, heads // 2, key_bias(rows_fg))
    attn_bg = sdpa(qp, kcp, vcp, heads // 2, key_bias(rows_bg))
    tq = rows_tgt[:, :, None]               # [2B, S, 1] query composite mask
    modulated = tq * attn_fg + (1.0 - tq) * attn_bg

    self_h = sdpa(qp, kp, vp, heads // 2)
    return _merge_parity(
        _blend_with_self(modulated, self_h, cfg, state), heads
    )


def _tca_bggen(q, k, v, heads, cfg, state, block_index=None):
    """Background-generation TCA (attention.py:1284-1324).

    Even heads: BG-masked reference attention (the removed object's keys
    are excluded so the hole is filled from background context); odd heads:
    unmasked reference-key attention (head-parity mask consumption, see
    `_parity_rows`); blended with vanilla self-attention.

    Shared-reference layout (cfg.shared_ref): streams are [u_g, c_g] and
    the reference K/V come from state.ref_kv[block_index] — captured once
    per step from the shared source inversion latent and broadcast over a
    same-source removal batch (pipeline.sample_bggen_loop_shared).
    """
    _check_parity_heads(heads)
    b, seq, _ = q.shape
    obj = state.fg_retain[seq]  # object / inpainting-region mask

    if cfg.shared_ref:
        assert state.ref_kv is not None and block_index in state.ref_kv, (
            "shared_ref layout needs EditState.ref_kv captured at every "
            f"TCA-gated layer (missing block {block_index})"
        )
        rk, rv = state.ref_kv[block_index]
        kc = jnp.broadcast_to(rk[None].astype(k.dtype), k.shape)
        vc = jnp.broadcast_to(rv[None].astype(v.dtype), v.shape)
        edit_only = False               # both streams are generated streams
    else:
        kc = _ref_stream_gather(k)
        vc = _ref_stream_gather(v)
        edit_only = cfg.ref_vanilla
    qp, kp, vp = (_split_parity(x, heads) for x in (q, k, v))
    kcp, vcp = _split_parity(kc, heads), _split_parity(vc, heads)
    rows_bg = _parity_rows(1.0 - obj, b, edit_only)
    ones_tq = jnp.ones((2 * b, seq), jnp.float32)

    # Fused route: with fg-keys = 1-obj and tq = 1, the kernel's modulated
    # output reduces to the BG-masked attention.
    fused = _tca_fused(qp, kp, vp, kcp, vcp, rows_bg, ones_tq,
                       _effective_cg(cfg, state), heads // 2)
    if fused is not None:
        return _merge_parity(fused, heads)

    attn_bg = sdpa(qp, kcp, vcp, heads // 2, key_bias(rows_bg))
    self_h = sdpa(qp, kp, vp, heads // 2)
    return _merge_parity(
        _blend_with_self(attn_bg, self_h, cfg, state), heads
    )


def _tca_compose(q, k, v, heads, cfg, state):
    """Composition TCA (attention.py:1092-1140).

    Streams [e, r_1..r_N, c_e].  For each source i the edit queries attend to
    source i's K/V restricted to src_mask_i, weighted by the (soft) target
    region mask tgt_mask_i, and summed.  Reference streams stay vanilla.
    """
    n = cfg.num_sources
    b, seq, _ = q.shape
    assert b == n + 2, (b, n)
    src = state.src_masks[seq]          # [N, S] key masks
    tgt = state.tgt_masks[seq][:n]      # [N, S] query weights (bg row unused)

    self_h = masked_sdpa(q, k, v, heads)

    # Batch the N per-source attentions: queries are the two edit streams
    # tiled across sources -> [2N, S, E] against K/V of streams 1..N.
    q_edit = jnp.stack([q[0], q[b - 1]])                   # [2, S, E]
    qn = jnp.repeat(q_edit, n, axis=0)                     # [2N, S, E]
    kn = jnp.tile(k[1 : n + 1], (2, 1, 1))                 # [2N, S, E]
    vn = jnp.tile(v[1 : n + 1], (2, 1, 1))
    per_src = masked_sdpa(qn, kn, vn, heads, jnp.tile(src, (2, 1)))
    w = jnp.tile(tgt, (2, 1))[:, :, None]                  # [2N, S, 1]
    summed = (per_src.astype(jnp.float32) * w).reshape(2, n, seq, -1).sum(1)

    hu_e = _blend_with_self(summed[0], self_h[0], cfg, state)
    hc_e = _blend_with_self(summed[1], self_h[b - 1], cfg, state)
    return jnp.concatenate(
        [hu_e[None], self_h[1 : b - 1], hc_e[None]], axis=0
    )


def _style_align_attention(q, k, v, heads, cfg, state):
    """StyleAligned shared attention, ssa/sdsa (attention.py:1142-1238).

    K/V become [own; ref] (seq -> 2*seq) where ref is the reference stream of
    each CFG half.  sdsa additionally restricts the appended reference keys:
      * edit mode : to the source-object FG (prepare_sdsa_mask, :940-951);
      * bggen mode: blocks own keys and the object's reference keys entirely
        (prepare_sdsa_mask_for_bggen, :926-939).
    """
    seq = q.shape[1]
    k_cat = jnp.concatenate([k, _ref_stream_gather(k)], axis=1)
    v_cat = jnp.concatenate([v, _ref_stream_gather(v)], axis=1)

    if cfg.method != "sdsa":
        return masked_sdpa(q, k_cat, v_cat, heads)

    # sdsa masks are consumed head-parity-interleaved like the TCA masks
    # (prepare_sdsa_mask builds the 4-row [m, 1, m, 1] pattern then
    # post_process_attn_mask tiles it over heads, attention.py:940-951):
    # even heads restricted, odd heads attend the full [own; ref] keys.
    _check_parity_heads(heads)
    ones = jnp.ones((seq,), jnp.float32)
    if cfg.mode == "bggen":
        obj = state.fg_retain[seq]
        allowed = 1.0 - jnp.concatenate([ones, obj])       # ref-BG keys only
    else:
        fg = state.fg_ref[seq]
        allowed = jnp.concatenate([ones, fg])              # own + ref-FG keys
    rows = _parity_rows(allowed, q.shape[0], cfg.ref_vanilla)
    out = masked_sdpa(
        _split_parity(q, heads),
        _split_parity(k_cat, heads),
        _split_parity(v_cat, heads),
        heads // 2,
        rows,
    )
    return _merge_parity(out, heads)


# ---------------------------------------------------------------------------
# GeoDiffuser attention sharing + losses
# ---------------------------------------------------------------------------


def _warp_feature_map(x: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample a [S, E] token map at [h, w, 2] (y, x) coordinates
    (GeoDiffuser warp_grid_edit, zeros padding)."""
    h, w, _ = coords.shape
    m = x.reshape(h, w, -1)

    def per_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [coords[..., 0], coords[..., 1]], order=1,
            mode="constant", cval=0.0,
        )

    return jax.vmap(per_channel, in_axes=-1, out_axes=-1)(m).reshape(
        h * w, -1
    )


def _coord_distance_grid(h: int, w: int) -> jnp.ndarray:
    """[S, S] pairwise distances in affine_grid's normalised [-1, 1]
    coordinates — per-axis 2*delta/size, the reference's exact metric
    (DISTANCE_CLASS.get_coord_distance, generic_torch.py:126-139;
    golden-pinned in tests/test_reference_golden_baselines2.py).  The
    removal d-weight exp(-d) and the amodal interpolation radii both
    inherit this scale."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) * (2.0 / h),
                          jnp.arange(w, dtype=jnp.float32) * (2.0 / w),
                          indexing="ij")
    pts = jnp.stack([ys.reshape(-1), xs.reshape(-1)], -1)
    d2 = jnp.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
    return jnp.sqrt(d2 + 1e-12)


def _interpolate_from_mask(feats, fg, dist):
    """Inverse-distance interpolation of `feats` [S, E] from the 4 nearest
    fg-masked positions (GeoDiffuser interpolate_from_mask,
    attention_sharing.py:68-105).  Returns (interpolated [S, E],
    distance weights [S])."""
    d = dist * 256.0 + 1e5 * (1.0 - fg)[None, :]
    inv = 1.0 / (d + 1e-4)
    vals, idx = jax.lax.top_k(inv, 4)                    # [S, 4]
    sel = feats[idx]                                     # [S, 4, E]
    interp = (sel * vals[..., None]).sum(-2) / (
        vals.sum(-1)[..., None] + 1e-12
    )
    w = jnp.exp(-(1.0 / jnp.maximum(vals.max(-1), 1e-12)) / 5.0)
    return interp, w


def _box_smooth_tokens(feats, h, w):
    """5x5 Gaussian smoothing of a [S, E] token map — the reference's
    exact feature smoother (generic_torch.py GaussianSmoothing with
    kernel_size=5: sigma = (5//2*2)/6 = 2/3 and the quirky exponent
    exp(-((d)/(2*sigma))**2), normalised, ZERO padding; applied per
    channel — golden-pinned in tests/test_reference_golden_baselines2.py)."""
    d = jnp.arange(5, dtype=jnp.float32) - 2.0
    sigma = (5 // 2 * 2) / 6.0
    k1 = jnp.exp(-((d / (2.0 * sigma)) ** 2))
    k2 = k1[:, None] * k1[None, :]
    k2 = k2 / k2.sum()
    m = feats.reshape(1, h, w, -1)
    c = m.shape[-1]
    kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c)).astype(m.dtype)
    out = jax.lax.conv_general_dilated(
        m, kern, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out.reshape(feats.shape)


def geodiff_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
    warp_yx: jnp.ndarray,       # [h, w, 2] inverse-warp coords
    m_obj: jnp.ndarray,         # [S] original object mask
    m_warp: jnp.ndarray,        # [S] warped object mask
    share_gate: jnp.ndarray,    # 0/1 attention-sharing step gate
    is_cross: bool,
    compute_losses: bool,
    compute_removal: bool,
    m_amodal: Optional[jnp.ndarray] = None,   # [S] amodal ring mask
):
    """GeoDiffuser attention sharing for a [base, edit] 2-stream batch
    (attention_processors.py:384-631).

    The reference output the edited image SHOULD have is built by warping
    the base stream's query map by the geometric transform (inside the
    warped-object region) and attending against base K/V.  The edit
    stream's live output (`replace_out`) attends with base keys (self) /
    its own text keys (cross) against base VALUES, and is pulled toward
    the reference by the sown losses:
      sim      — L1 over the background (background_preservation_loss),
      movement — L1 over the warped object (object_placement_loss_geodiff),
      removal  — attention-correlation log-ratio over the vacated hole,
                 distance-weighted (removal_loss_geodiff),
      smooth   — spatial gradient L1 of the edit output.
    Returns ([base_out, edit_out], {loss_name: scalar}).
    """
    seq = q.shape[1]
    m_wo_edit = jnp.clip(1.0 - m_obj - m_warp, 0.0, 1.0)   # background
    m_inpaint = jnp.clip(m_obj - m_warp, 0.0, 1.0)          # vacated hole

    q_b, q_e = q[0:1], q[1:2]
    k_b, v_b = k[0:1], v[0:1]
    k_e = k[1:2]

    # reference output: warped base queries vs base K/V (no grads)
    q_warp = _warp_feature_map(q_b[0], warp_yx)
    q_ref = (1.0 - m_warp[:, None]) * q_b[0] + m_warp[:, None] * q_warp
    edit_out = jax.lax.stop_gradient(
        sdpa(q_ref[None].astype(q.dtype), k_b, v_b, heads)
    ).astype(jnp.float32)

    # live edit output: base keys for self-attn, own (text) keys for cross
    k_live = k_e if is_cross else jax.lax.stop_gradient(k_b)
    replace_out = sdpa(
        q_e, k_live, jax.lax.stop_gradient(v_b), heads
    ).astype(jnp.float32)

    losses = {}
    if compute_losses:
        wo = m_wo_edit[None, :, None]
        we = m_warp[None, :, None]
        diff = jnp.abs(edit_out - replace_out)
        e = replace_out.shape[-1]
        losses["sim"] = jnp.sum(diff * wo) / (jnp.sum(wo) * e + 1e-8)
        losses["movement"] = jnp.sum(diff * we) / (jnp.sum(we) * e + 1e-8)
        h_side = warp_yx.shape[0]
        maps = replace_out.reshape(1, h_side, -1, e)
        losses["smooth"] = (
            jnp.abs(maps[:, 1:] - maps[:, :-1]).mean()
            + jnp.abs(maps[:, :, 1:] - maps[:, :, :-1]).mean()
        )
        if compute_removal:
            probs_e = _probs_headwise(q_e, k_live, heads)      # [H, S, S]
            probs_b = jax.lax.stop_gradient(
                _probs_headwise(q_b, k_b, heads)
            )
            corr = jnp.einsum("hrk,hck->hrc", probs_e, probs_b)  # [H, S, S]
            dist = _coord_distance_grid(h_side, seq // h_side)
            c_in = corr * m_inpaint[None, None, :]
            c_wo = corr * m_wo_edit[None, None, :]
            p_in = jnp.max(c_in, -1)
            p_wo = jnp.max(c_wo, -1)
            idx_wo = jnp.argmax(c_wo, -1)                      # [H, S]
            d_wo = jax.lax.stop_gradient(
                jnp.exp(-dist[jnp.arange(seq)[None], idx_wo])
            )
            rows = m_inpaint[None, :]
            f = probs_e.shape[0]
            losses["removal"] = jnp.sum(
                rows * d_wo * (-jnp.log(p_wo + 1e-4) + jnp.log(p_in + 1e-4))
            ) / (jnp.sum(m_inpaint) * f + 1e-8)

            if m_amodal is not None:
                # amodal completion (amodal_loss_geodiff,
                # attention_processors.py:289-305): pull the amodal ring
                # toward inverse-distance-interpolated object features
                interp, iw = _interpolate_from_mask(
                    edit_out[0], m_warp, dist
                )
                interp = jnp.where(
                    m_warp[:, None] > 0.5,
                    jax.lax.stop_gradient(edit_out[0]), interp,
                )
                interp = _box_smooth_tokens(
                    interp, h_side, seq // h_side
                )
                am = (m_amodal * iw)[:, None]
                e = replace_out.shape[-1]
                losses["amodal"] = jnp.sum(
                    jnp.abs(jax.lax.stop_gradient(interp)
                            - replace_out[0]) * am
                ) / (jnp.sum(am) * e + 1e-8)

    # attention sharing during the edit window; plain replace after
    shared = (
        m_warp[None, :, None] * edit_out
        + (1.0 - m_warp[None, :, None]) * replace_out
    )
    out_e = jnp.where(share_gate > 0, shared, replace_out).astype(q.dtype)
    base_out = sdpa(q_b, k_b, v_b, heads)
    return jnp.concatenate([base_out, out_e], axis=0), losses


def _probs_headwise(q, k, heads):
    qh = split_heads(q, heads).astype(jnp.float32)[0]
    kh = split_heads(k, heads).astype(jnp.float32)[0]
    scale = 1.0 / jnp.sqrt(jnp.float32(qh.shape[-1]))
    return jax.nn.softmax(
        jnp.einsum("hqd,hkd->hqk", qh, kh) * scale, axis=-1
    )


# ---------------------------------------------------------------------------
# Cross-attention dispatch (local CFG)
# ---------------------------------------------------------------------------


def edit_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    cfg: EditConfig,
    state: Optional[EditState],
    k_extra: Optional[jnp.ndarray] = None,
    v_extra: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch text cross-attention.

    edit / bggen (reference modulate_local_cross_attn{,_bg},
    attention.py:1326-1393): run attention on all 4 streams, then recombine:
      out = [u_e, u_r, local * c_e + (1 - local) * u_e, u_r]
    — the conditional edit stream is localised to the edit region and the
    conditional reference stream is *replaced* by the unconditional one.

    compose (modulate_local_cross_attn_compose, :1394-1432): the uncond
    streams attend to their own ("") text; the conditional edit stream is a
    sum over regions of tgt_mask_i * attn(q_ce, text_i) using the separate
    region-prompt K/V passed as k_extra/v_extra [P, 77, E].
    """
    if cfg.mode == "none" or not cfg.local_cfg or state is None:
        return sdpa(q, k, v, heads)

    if cfg.mode == "compose":
        n = cfg.num_sources
        p = cfg.prompt_length
        b, seq, _ = q.shape
        assert b == n + 2 and k_extra is not None and p >= 1
        # uncond streams [e, r_1..r_N] with their own uncond text K/V
        hu = sdpa(q[: b - 1], k[: b - 1], v[: b - 1], heads)
        # cond edit stream: per-region prompts
        tgt = state.tgt_masks[seq][:p]                     # [P, S]
        qe = jnp.repeat(q[b - 1 : b], p, axis=0)           # [P, S, E]
        per_prompt = sdpa(qe, k_extra, v_extra, heads)     # [P, S, E]
        hc = (per_prompt.astype(jnp.float32) * tgt[:, :, None]).sum(0)
        return jnp.concatenate([hu, hc[None].astype(q.dtype)], axis=0)

    # edit / bggen: 4-stream [u_e, u_r, c_e, c_r] or deduped 3-stream
    # [u_e, r, c_e] — either way h[0]/h[1]/h[2] are u_e/ref/c_e, and the
    # legacy layout's c_r output is *replaced* by u_r (attention.py:1391).
    # Shared-reference layout: 2 streams [u_e, c_e], no reference row.
    seq = q.shape[1]
    local = state.local_region[seq][:, None]               # [S, 1]
    h = sdpa(q, k, v, heads)
    if cfg.shared_ref:
        assert q.shape[0] == 2, q.shape
        u_e, c_e = h[0], h[1]
        mod_c_e = local * c_e.astype(jnp.float32) + (
            1.0 - local
        ) * u_e.astype(jnp.float32)
        return jnp.stack([u_e, mod_c_e.astype(h.dtype)])
    u_e, u_r, c_e = h[0], h[1], h[2]
    mod_c_e = local * c_e.astype(jnp.float32) + (1.0 - local) * u_e.astype(
        jnp.float32
    )
    if q.shape[0] == 3:
        return jnp.stack([u_e, u_r, mod_c_e.astype(h.dtype)])
    return jnp.stack([u_e, u_r, mod_c_e.astype(h.dtype), u_r])
