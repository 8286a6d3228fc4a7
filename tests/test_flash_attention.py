"""Golden tests: Pallas flash kernels vs the einsum reference path.

Run in interpret mode on CPU (the kernels auto-select interpret off-TPU);
the same code compiles with Mosaic on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.edit import EditConfig, EditState
from freefine_tpu.ops import attention as A
from freefine_tpu.ops.flash_attention import flash_sdpa, tca_flash

HEADS = 2
SEQ = 256
DIM = 16


@pytest.fixture
def qkv(rng_np):
    q = rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32)
    k = rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32)
    v = rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_sdpa_unmasked(qkv):
    q, k, v = qkv
    got = flash_sdpa(q, k, v, heads=HEADS, block_q=128, block_k=128)
    want = A.sdpa(q, k, v, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_sdpa_key_mask(qkv, rng_np):
    q, k, v = qkv
    rows = jnp.asarray((rng_np.random((4, SEQ)) > 0.5).astype(np.float32))
    got = flash_sdpa(q, k, v, rows, heads=HEADS, block_q=128, block_k=128)
    want = A.sdpa(q, k, v, HEADS, A.key_bias(rows))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_sdpa_cross_shaped(qkv, rng_np):
    """Sq != Sk (share-attention doubles the KV length)."""
    q, k, v = qkv
    idx = jnp.array([1, 1, 3, 3])
    k2 = jnp.concatenate([k, k[idx]], axis=1)
    v2 = jnp.concatenate([v, v[idx]], axis=1)
    got = flash_sdpa(q, k2, v2, heads=HEADS, block_q=128, block_k=128)
    want = A.sdpa(q, k2, v2, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_sdpa_fully_masked_rows(qkv):
    """All-zero key mask degrades to uniform attention (finfo.min
    convention), identically in both paths."""
    q, k, v = qkv
    rows = jnp.zeros((4, SEQ), jnp.float32)
    got = flash_sdpa(q, k, v, rows, heads=HEADS, block_q=128, block_k=128)
    want = A.sdpa(q, k, v, HEADS, A.key_bias(rows))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_flash_sdpa_bf16(qkv):
    q, k, v = (x.astype(jnp.bfloat16) for x in qkv)
    got = flash_sdpa(q, k, v, heads=HEADS, block_q=128, block_k=128)
    want = A.sdpa(q, k, v, HEADS)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def _einsum_tca(q, k, v, fg_ref, tgt, cg):
    kc, vc = k[jnp.array([1, 1, 3, 3])], v[jnp.array([1, 1, 3, 3])]
    attn_fg = A.sdpa(q, kc, vc, HEADS, A.key_bias(A._edit_rows(fg_ref, 4)))
    attn_bg = A.sdpa(q, kc, vc, HEADS, A.key_bias(A._edit_rows(1.0 - fg_ref, 4)))
    tq = A._edit_rows(tgt, 4)[:, :, None]
    modulated = tq * attn_fg + (1.0 - tq) * attn_bg
    self_h = A.sdpa(q, k, v, HEADS)
    return cg * modulated + (1.0 - cg) * self_h


def test_tca_flash_matches_einsum_composite(qkv, rng_np):
    q, k, v = qkv
    fg = jnp.asarray((rng_np.random(SEQ) > 0.5).astype(np.float32))
    tgt = jnp.asarray((rng_np.random(SEQ) > 0.4).astype(np.float32))
    cg = 0.7
    kc, vc = k[jnp.array([1, 1, 3, 3])], v[jnp.array([1, 1, 3, 3])]
    got = tca_flash(
        q, k, v, kc, vc, A._edit_rows(fg, 4), A._edit_rows(tgt, 4),
        jnp.float32(cg), heads=HEADS, block_q=128, block_k=128,
    )
    want = _einsum_tca(q, k, v, fg, tgt, cg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_dispatch_flash_forced_matches_einsum(qkv, rng_np, monkeypatch):
    """Force FLASH_MODE=1: the full dispatch (edit TCA) equals the einsum path."""
    q, k, v = qkv
    fg = jnp.asarray((rng_np.random(SEQ) > 0.5).astype(np.float32))
    tgt = jnp.asarray(rng_np.random(SEQ).astype(np.float32))
    cfg = EditConfig(mode="edit", method="tca")
    state = EditState(
        fg_ref={SEQ: fg}, fg_retain={SEQ: tgt}, local_region={SEQ: tgt},
        context_guidance=jnp.float32(0.6),
    )
    want = A.edit_self_attention(q, k, v, HEADS, cfg, state, 12, "up")
    monkeypatch.setattr(A, "FLASH_MODE", "1")
    got = A.edit_self_attention(q, k, v, HEADS, cfg, state, 12, "up")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_dispatch_flash_bggen_matches(qkv, rng_np, monkeypatch):
    q, k, v = qkv
    obj = jnp.asarray((rng_np.random(SEQ) > 0.6).astype(np.float32))
    cfg = EditConfig(mode="bggen", method="tca")
    state = EditState(
        fg_ref={SEQ: obj}, fg_retain={SEQ: obj}, local_region={SEQ: obj},
        context_guidance=jnp.float32(0.8),
    )
    want = A.edit_self_attention(q, k, v, HEADS, cfg, state, 12, "up")
    monkeypatch.setattr(A, "FLASH_MODE", "1")
    got = A.edit_self_attention(q, k, v, HEADS, cfg, state, 12, "up")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_flash_sdpa_diff_forward_matches(qkv, rng_np):
    from freefine_tpu.ops.flash_attention import flash_sdpa_diff

    q, k, v = qkv
    rows = jnp.asarray((rng_np.random((4, SEQ)) > 0.5).astype(np.float32))
    got = flash_sdpa_diff(q, k, v, rows, HEADS, 128, 128)
    want = A.sdpa(q, k, v, HEADS, A.key_bias(rows))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_sdpa_vjp_matches_einsum_grads(qkv, rng_np):
    """Flash backward vs autodiff through the einsum reference."""
    from freefine_tpu.ops.flash_attention import flash_sdpa_diff

    q, k, v = qkv
    rows = jnp.asarray((rng_np.random((4, SEQ)) > 0.4).astype(np.float32))
    tgt = jnp.asarray(rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_sdpa_diff(q, k, v, rows, HEADS, 128, 128)
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(q, k, v):
        out = A.sdpa(q, k, v, HEADS, A.key_bias(rows))
        return jnp.sum((out - tgt) ** 2)

    gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=3e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=3e-4)


def test_tca_flash_diff_forward_matches(qkv, rng_np):
    from freefine_tpu.ops.flash_attention import tca_flash_diff

    q, k, v = qkv
    fg = jnp.asarray((rng_np.random(SEQ) > 0.5).astype(np.float32))
    tgt = jnp.asarray((rng_np.random(SEQ) > 0.4).astype(np.float32))
    kc, vc = k[jnp.array([1, 1, 3, 3])], v[jnp.array([1, 1, 3, 3])]
    got = tca_flash_diff(
        q, k, v, kc, vc, A._edit_rows(fg, 4), A._edit_rows(tgt, 4),
        jnp.float32(0.7), HEADS, 128, 128,
    )
    want = _einsum_tca(q, k, v, fg, tgt, 0.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    # under vjp the residual-emitting forward must agree too
    got_vjp, _ = jax.vjp(
        lambda q_, ks_, vs_, km_, vm_: tca_flash_diff(
            q_, ks_, vs_, km_, vm_, A._edit_rows(fg, 4), A._edit_rows(tgt, 4),
            jnp.float32(0.7), HEADS, 128, 128,
        ),
        q, k, v, kc, vc,
    )
    np.testing.assert_allclose(np.asarray(got_vjp), np.asarray(want), atol=3e-5)


def test_tca_flash_vjp_matches_einsum_grads(qkv, rng_np):
    """TCA flash backward vs autodiff through the einsum composite — all five
    differentiable inputs (q, k/v self, k/v modulated)."""
    from freefine_tpu.ops.flash_attention import tca_flash_diff

    q, k, v = qkv
    fg = jnp.asarray((rng_np.random(SEQ) > 0.5).astype(np.float32))
    tgt = jnp.asarray((rng_np.random(SEQ) > 0.4).astype(np.float32))
    cg = 0.7
    out_tgt = jnp.asarray(rng_np.normal(size=(4, SEQ, DIM)).astype(np.float32))

    def loss_flash(q, ks, vs, km, vm):
        out = tca_flash_diff(
            q, ks, vs, km, vm, A._edit_rows(fg, 4), A._edit_rows(tgt, 4),
            jnp.float32(cg), HEADS, 128, 128,
        )
        return jnp.sum((out - out_tgt) ** 2)

    def loss_ref(q, ks, vs, km, vm):
        rows_fg = A._edit_rows(fg, 4)
        rows_tq = A._edit_rows(tgt, 4)
        attn_fg = A.sdpa(q, km, vm, HEADS, A.key_bias(rows_fg))
        attn_bg = A.sdpa(q, km, vm, HEADS, A.key_bias(1.0 - rows_fg))
        tq = rows_tq[:, :, None]
        modulated = tq * attn_fg + (1.0 - tq) * attn_bg
        out = cg * modulated + (1.0 - cg) * A.sdpa(q, ks, vs, HEADS)
        return jnp.sum((out - out_tgt) ** 2)

    kc, vc = k[jnp.array([1, 1, 3, 3])], v[jnp.array([1, 1, 3, 3])]
    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, kc, vc)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, kc, vc)
    for g, w, name in zip(got, want, ("dq", "dks", "dvs", "dkm", "dvm")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, err_msg=name
        )


def test_dispatch_tca_grad_through_flash(qkv, rng_np, monkeypatch):
    """jax.grad through the full edit TCA dispatch with flash forced matches
    the einsum dispatch gradient (the energy-guidance code path)."""
    q, k, v = qkv
    fg = jnp.asarray((rng_np.random(SEQ) > 0.5).astype(np.float32))
    tgt = jnp.asarray(rng_np.random(SEQ).astype(np.float32))
    cfg = EditConfig(mode="edit", method="tca")
    state = EditState(
        fg_ref={SEQ: fg}, fg_retain={SEQ: tgt}, local_region={SEQ: tgt},
        context_guidance=jnp.float32(0.6),
    )

    def loss(q):
        return jnp.sum(
            A.edit_self_attention(q, k, v, HEADS, cfg, state, 12, "up") ** 2
        )

    want = jax.grad(loss)(q)
    monkeypatch.setattr(A, "FLASH_MODE", "1")
    got = jax.grad(loss)(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_flash_sdpa_vjp_unmasked(qkv, rng_np):
    from freefine_tpu.ops.flash_attention import flash_sdpa_diff

    q, k, v = qkv
    ones = jnp.ones((4, SEQ), jnp.float32)

    def loss_flash(q):
        return jnp.sum(flash_sdpa_diff(q, k, v, ones, HEADS, 128, 128) ** 2)

    def loss_ref(q):
        return jnp.sum(A.sdpa(q, k, v, HEADS) ** 2)

    gq = jax.grad(loss_flash)(q)
    rq = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=3e-4)


def test_masked_sdpa_padded_nonmultiple_seq(rng_np, monkeypatch):
    """Non-128-multiple sequences route through the flash kernel by
    pad-and-mask (the SV3D 72x72=5184-token case) and match einsum, both
    self-shaped and cross-shaped, with and without a user key mask."""
    monkeypatch.setattr(A, "FLASH_MODE", "1")
    q = jnp.asarray(rng_np.normal(size=(2, 272, DIM)).astype(np.float32))
    k = jnp.asarray(rng_np.normal(size=(2, 200, DIM)).astype(np.float32))
    v = jnp.asarray(rng_np.normal(size=(2, 200, DIM)).astype(np.float32))

    got = A.masked_sdpa(q, k, v, HEADS)
    want = A.sdpa(q, k, v, HEADS)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    rows = jnp.asarray((rng_np.random((2, 200)) > 0.4).astype(np.float32))
    got = A.masked_sdpa(q, k, v, HEADS, key_rows=rows)
    want = A.sdpa(q, k, v, HEADS, A.key_bias(rows))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_masked_sdpa_padded_grads_match(rng_np, monkeypatch):
    """Gradients flow through the pad-and-mask flash route and agree with
    the einsum path (padded keys/queries get zero contribution)."""
    monkeypatch.setattr(A, "FLASH_MODE", "1")
    q = jnp.asarray(rng_np.normal(size=(1, 136, DIM)).astype(np.float32))
    k = jnp.asarray(rng_np.normal(size=(1, 136, DIM)).astype(np.float32))
    v = jnp.asarray(rng_np.normal(size=(1, 136, DIM)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(A.masked_sdpa(q, k, v, HEADS) ** 2)

    def loss_einsum(q, k, v):
        return jnp.sum(A.sdpa(q, k, v, HEADS) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
