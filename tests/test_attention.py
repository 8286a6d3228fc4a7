"""Property tests for the edit-aware attention ops.

Each test checks the functional ops against the semantics of the reference
`Attention_Modulator` (/root/reference/src/utils/attention.py:640-1445),
re-derived as independent dense-mask computations in float32.  The masks are
consumed head-parity-interleaved, matching the reference's actual tiled-mask
behaviour (see ops/attention._parity_rows and tests/test_reference_golden.py,
which pins the same semantics against the reference's own code).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.edit import EditConfig, EditState
from freefine_tpu.ops import attention as A

HEADS = 2
SEQ = 16
DIM = 8  # embed dim (heads * head_dim)


def np_sdpa(q, k, v, heads, key_mask_rows=None):
    """Dense-mask reference attention in numpy.

    q [B,Sq,E], k/v [B,Sk,E]; key_mask_rows [B,Sk] or per-head [B,H,Sk]
    0/1 (0 -> masked out).  Mirrors the reference's baddbmm + additive
    finfo.min mask (attention.py:774-806,856-860).
    """
    b, sq, e = q.shape
    sk = k.shape[1]
    d = e // heads
    out = np.zeros((b, sq, e), np.float32)
    scale = 1.0 / np.sqrt(d)
    for bi in range(b):
        for h in range(heads):
            qh = q[bi, :, h * d : (h + 1) * d]
            kh = k[bi, :, h * d : (h + 1) * d]
            vh = v[bi, :, h * d : (h + 1) * d]
            logits = qh @ kh.T * scale
            if key_mask_rows is not None:
                rows = (
                    key_mask_rows[bi, h]
                    if key_mask_rows.ndim == 3 else key_mask_rows[bi]
                )
                logits = logits + (rows[None, :] - 1.0) * -A.NEG_INF
            logits = logits - logits.max(-1, keepdims=True)
            p = np.exp(logits)
            p = p / p.sum(-1, keepdims=True)
            out[bi, :, h * d : (h + 1) * d] = p @ vh
    return out


def np_parity_rows(m, b, heads, ref_vanilla=False):
    """[S] -> [B, H, S]: even heads masked, odd heads all-ones — the
    reference's effective tiled-mask layout (attention.py:856-897).
    ref_vanilla: reference streams (odd batch indices in the 4-stream
    layout, index 1 in the 3-stream) stay unmasked on every head."""
    edits = {1: (0,), 3: (1, 0, 1), 4: (1, 0, 1, 0)}[b]
    ones = np.ones_like(m)
    rows = np.empty((b, heads, m.shape[0]), np.float32)
    for bi in range(b):
        for h in range(heads):
            masked = h % 2 == 0 and (edits[bi] or not ref_vanilla)
            rows[bi, h] = m if masked else ones
    return rows


def np_tca_modulated(q, kr, vr, heads, fg_ref, tgt, ref_vanilla=False):
    """Reference TCA modulated branch: per-head-parity FG/BG composite."""
    b = q.shape[0]
    fg_rows = np_parity_rows(fg_ref, b, heads, ref_vanilla)
    bg_rows = np_parity_rows(1 - fg_ref, b, heads, ref_vanilla)
    tq = np_parity_rows(tgt, b, heads, ref_vanilla)
    attn_fg = np_sdpa(q, kr, vr, heads, fg_rows)
    attn_bg = np_sdpa(q, kr, vr, heads, bg_rows)
    d = q.shape[-1] // heads
    # tq is [B, H, S] -> broadcast to [B, S, H*D] grouped head-major
    tq_e = np.concatenate(
        [np.repeat(tq[:, h, :, None], d, axis=-1) for h in range(heads)],
        axis=-1,
    )
    return tq_e * attn_fg + (1 - tq_e) * attn_bg


@pytest.fixture
def qkv(rng_np):
    q = rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32)
    k = rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32)
    v = rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32)
    return q, k, v


@pytest.fixture
def masks(rng_np):
    fg_ref = (rng_np.random(SEQ) > 0.5).astype(np.float32)
    tgt = rng_np.random(SEQ).astype(np.float32) * (rng_np.random(SEQ) > 0.4)
    return fg_ref, tgt


def make_state(fg_ref, tgt, cg=0.7, gate=1.0, **kw):
    return EditState(
        fg_ref={SEQ: jnp.asarray(fg_ref)},
        fg_retain={SEQ: jnp.asarray(tgt)},
        local_region={SEQ: jnp.asarray(tgt)},
        context_guidance=jnp.float32(cg),
        share_gate=jnp.float32(gate),
        **kw,
    )


def test_sdpa_matches_dense(qkv):
    q, k, v = qkv
    got = A.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), HEADS)
    want = np_sdpa(q, k, v, HEADS)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tca_edit_matches_dense_reference(qkv, masks):
    """Edit-mode TCA == dense two-pass masked attention composite + blend."""
    q, k, v = qkv
    fg_ref, tgt = masks
    cg = 0.7
    cfg = EditConfig(mode="edit", method="tca")
    state = make_state(fg_ref, tgt, cg=cg)

    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=12, place="up",
    )

    # Dense reference (attention.py:1043-1091): K/V <- ref stream of each CFG
    # half; head-parity FG/BG key masks; composite by binarised tgt.
    kr, vr = k[[1, 1, 3, 3]], v[[1, 1, 3, 3]]
    tgt_b = (tgt > 0).astype(np.float32)
    modulated = np_tca_modulated(q, kr, vr, HEADS, fg_ref, tgt_b)
    self_h = np_sdpa(q, k, v, HEADS)
    want = cg * modulated + (1 - cg) * self_h

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tca_reference_streams_even_head_self_modulation(qkv, masks):
    """Reference streams (1, 3) under the head-parity mask layout: odd heads
    are vanilla self-attention; even heads run the masked composite over
    their OWN keys (the gather is the identity for reference streams)."""
    q, k, v = qkv
    fg_ref, tgt = masks
    cfg = EditConfig(mode="edit", method="mmsa")
    state = make_state(fg_ref, tgt)
    got = np.asarray(
        A.edit_self_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            HEADS, cfg, state, block_index=12, place="up",
        )
    )
    kr, vr = k[[1, 1, 3, 3]], v[[1, 1, 3, 3]]
    want = np_tca_modulated(q, kr, vr, HEADS, fg_ref, tgt)
    d = DIM // HEADS
    # odd heads of every stream = vanilla self-attention (kr == k there for
    # reference streams; for edit streams odd heads are unmasked ref attn)
    vanilla = np_sdpa(q, k, v, HEADS)
    np.testing.assert_allclose(
        got[1, :, d:], vanilla[1, :, d:], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[3], want[3], rtol=1e-4, atol=1e-4)


def test_tca_ref_vanilla_keeps_reference_streams_vanilla(qkv, masks):
    """EditConfig.ref_vanilla (intent semantics / shared-source lane):
    streams 1 and 3 come out as plain self-attention."""
    q, k, v = qkv
    fg_ref, tgt = masks
    for method in ("tca", "mmsa"):
        cfg = EditConfig(mode="edit", method=method, ref_vanilla=True)
        state = make_state(fg_ref, tgt)
        got = np.asarray(
            A.edit_self_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                HEADS, cfg, state, block_index=12, place="up",
            )
        )
        want = np_sdpa(q, k, v, HEADS)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got[3], want[3], rtol=1e-4, atol=1e-4)


def test_mmsa_uses_soft_target_mask(qkv, masks):
    q, k, v = qkv
    fg_ref, tgt = masks
    cfg = EditConfig(mode="edit", method="mmsa")
    state = make_state(fg_ref, tgt)
    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=12, place="up",
    )
    kr, vr = k[[1, 1, 3, 3]], v[[1, 1, 3, 3]]
    want = np_tca_modulated(q, kr, vr, HEADS, fg_ref, tgt)  # soft tgt
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_context_guidance_is_vanilla(qkv, masks):
    q, k, v = qkv
    fg_ref, tgt = masks
    cfg = EditConfig(mode="edit", method="tca")
    state = make_state(fg_ref, tgt, cg=0.0)
    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=12, place="up",
    )
    np.testing.assert_allclose(got, np_sdpa(q, k, v, HEADS), rtol=1e-4, atol=1e-4)


def test_share_gate_zero_is_vanilla(qkv, masks):
    """share_gate=0 reproduces mmsa_es's hard cut-off (model.py:589-591)."""
    q, k, v = qkv
    fg_ref, tgt = masks
    cfg = EditConfig(mode="edit", method="mmsa")
    state = make_state(fg_ref, tgt, gate=0.0)
    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=12, place="up",
    )
    np.testing.assert_allclose(got, np_sdpa(q, k, v, HEADS), rtol=1e-4, atol=1e-4)


def test_layer_gate_passthrough(qkv, masks):
    """Blocks outside layer_range fall through to vanilla attention."""
    q, k, v = qkv
    fg_ref, tgt = masks
    cfg = EditConfig(mode="edit", method="tca", layer_range=(10, 16))
    state = make_state(fg_ref, tgt)
    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=5, place="down",
    )
    np.testing.assert_allclose(got, np_sdpa(q, k, v, HEADS), rtol=1e-4, atol=1e-4)


def test_bggen_tca_matches_dense(qkv, masks):
    """bggen: BG-masked reference attention only (attention.py:1284-1324)."""
    q, k, v = qkv
    _, obj = masks
    cg = 0.6
    cfg = EditConfig(mode="bggen", method="tca")
    state = make_state(np.zeros(SEQ, np.float32), obj, cg=cg)
    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=12, place="up",
    )
    kr, vr = k[[1, 1, 3, 3]], v[[1, 1, 3, 3]]
    bg_rows = np_parity_rows(1 - obj, 4, HEADS)
    attn_bg = np_sdpa(q, kr, vr, HEADS, bg_rows)
    self_h = np_sdpa(q, k, v, HEADS)
    want = cg * attn_bg + (1 - cg) * self_h
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_compose_tca_matches_dense(rng_np):
    """Compose mode: per-source masked attentions summed by target weights
    (attention.py:1092-1140)."""
    n = 2
    b = n + 2  # [e, r1, r2, c_e]
    q = rng_np.normal(size=(b, SEQ, DIM)).astype(np.float32)
    k = rng_np.normal(size=(b, SEQ, DIM)).astype(np.float32)
    v = rng_np.normal(size=(b, SEQ, DIM)).astype(np.float32)
    src = (rng_np.random((n, SEQ)) > 0.5).astype(np.float32)
    tgt = rng_np.random((n + 1, SEQ)).astype(np.float32)
    cg = 0.8

    cfg = EditConfig(mode="compose", method="tca", num_sources=n, num_streams=b)
    state = EditState(
        src_masks={SEQ: jnp.asarray(src)},
        tgt_masks={SEQ: jnp.asarray(tgt)},
        context_guidance=jnp.float32(cg),
    )
    got = np.asarray(
        A.edit_self_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            HEADS, cfg, state, block_index=12, place="up",
        )
    )

    self_h = np_sdpa(q, k, v, HEADS)
    hu_new = np.zeros_like(self_h[0])
    hc_new = np.zeros_like(self_h[0])
    for i in range(n):
        a_u = np_sdpa(q[0:1], k[i + 1 : i + 2], v[i + 1 : i + 2], HEADS, src[i : i + 1])
        a_c = np_sdpa(
            q[b - 1 : b], k[i + 1 : i + 2], v[i + 1 : i + 2], HEADS, src[i : i + 1]
        )
        hu_new += tgt[i][:, None] * a_u[0]
        hc_new += tgt[i][:, None] * a_c[0]
    want_u = cg * hu_new + (1 - cg) * self_h[0]
    want_c = cg * hc_new + (1 - cg) * self_h[b - 1]

    np.testing.assert_allclose(got[0], want_u, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[b - 1], want_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1:-1], self_h[1:-1], rtol=1e-4, atol=1e-4)


def test_ssa_appends_reference_kv(qkv, masks):
    """ssa == attention over [own; ref] K/V (attention.py:1142-1192)."""
    q, k, v = qkv
    fg_ref, tgt = masks
    cfg = EditConfig(mode="edit", method="ssa")
    state = make_state(fg_ref, tgt)
    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=3, place="down",
    )
    k_cat = np.concatenate([k, k[[1, 1, 3, 3]]], axis=1)
    v_cat = np.concatenate([v, v[[1, 1, 3, 3]]], axis=1)
    want = np_sdpa(q, k_cat, v_cat, HEADS)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sdsa_restricts_reference_keys(qkv, masks):
    q, k, v = qkv
    fg_ref, tgt = masks
    cfg = EditConfig(mode="edit", method="sdsa")
    state = make_state(fg_ref, tgt)
    got = A.edit_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        HEADS, cfg, state, block_index=3, place="down",
    )
    k_cat = np.concatenate([k, k[[1, 1, 3, 3]]], axis=1)
    v_cat = np.concatenate([v, v[[1, 1, 3, 3]]], axis=1)
    allowed = np.concatenate([np.ones(SEQ, np.float32), fg_ref])
    rows = np_parity_rows(allowed, 4, HEADS)
    want = np_sdpa(q, k_cat, v_cat, HEADS, rows)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_local_cross_attention_recombination(rng_np, masks):
    """Cross-attn local CFG: rows become [u_e, u_r, local*c_e+(1-local)*u_e, u_r]
    (attention.py:1326-1393)."""
    _, local = masks
    q = rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32)
    k = rng_np.normal(size=(4, 7, DIM)).astype(np.float32)
    v = rng_np.normal(size=(4, 7, DIM)).astype(np.float32)
    cfg = EditConfig(mode="edit", method="tca", local_cfg=True)
    state = make_state(np.zeros(SEQ, np.float32), local)
    got = np.asarray(
        A.edit_cross_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), HEADS, cfg, state
        )
    )
    h = np_sdpa(q, k, v, HEADS)
    mod = local[:, None] * h[2] + (1 - local)[:, None] * h[0]
    np.testing.assert_allclose(got[0], h[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], h[1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[2], mod, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[3], h[1], rtol=1e-4, atol=1e-4)


def test_compose_cross_attention(rng_np):
    """Compose cross-attn: uncond streams use own text; cond edit stream sums
    per-region prompts (attention.py:1394-1432)."""
    n, p = 2, 3  # 2 sources; 3 region prompts (incl. trailing "")
    b = n + 2
    tl = 7
    q = rng_np.normal(size=(b, SEQ, DIM)).astype(np.float32)
    k = rng_np.normal(size=(b, tl, DIM)).astype(np.float32)
    v = rng_np.normal(size=(b, tl, DIM)).astype(np.float32)
    ke = rng_np.normal(size=(p, tl, DIM)).astype(np.float32)
    ve = rng_np.normal(size=(p, tl, DIM)).astype(np.float32)
    tgt = rng_np.random((p, SEQ)).astype(np.float32)

    cfg = EditConfig(
        mode="compose", method="tca", num_sources=n, num_streams=b, prompt_length=p
    )
    state = EditState(tgt_masks={SEQ: jnp.asarray(tgt)})
    got = np.asarray(
        A.edit_cross_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), HEADS, cfg, state,
            k_extra=jnp.asarray(ke), v_extra=jnp.asarray(ve),
        )
    )
    hu = np_sdpa(q[: b - 1], k[: b - 1], v[: b - 1], HEADS)
    hc = np.zeros((SEQ, DIM), np.float32)
    for i in range(p):
        a = np_sdpa(q[b - 1 : b], ke[i : i + 1], ve[i : i + 1], HEADS)[0]
        hc += tgt[i][:, None] * a
    np.testing.assert_allclose(got[: b - 1], hu, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[b - 1], hc, rtol=1e-4, atol=1e-4)
