"""GeoDiffuser baseline core tests: warp grids, mask warping, the shared
attention op + loss properties, and the e2e tiny edit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.baselines.geo_diffuser import (
    GeoDiffuser,
    warp_coord_pyramid,
    warp_mask,
)
from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.ops.attention import geodiff_attention, sdpa
from freefine_tpu.ops.geometry import edit_affine_matrix
from freefine_tpu.pipeline import FreeFine


def test_warp_mask_translation():
    m = np.zeros((32, 32), np.float32)
    m[8:12, 8:12] = 1.0
    mat = edit_affine_matrix((9.5, 9.5), 10, 4, 0, 1, 1)
    out = warp_mask(m, mat)
    assert out[10, 10] == 0 and out[14, 19] == 1.0
    assert out.sum() == m.sum()


def test_warp_coord_pyramid_identity():
    mat = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    pyr = warp_coord_pyramid(mat, 8, 8)
    assert set(pyr.keys()) == {64, 16, 4, 1}
    g = np.asarray(pyr[64]).reshape(8, 8, 2)
    # identity transform: coords are the pixel grid itself
    np.testing.assert_allclose(g[3, 5], [3, 5], atol=1e-5)


def test_geodiff_attention_sharing_and_losses():
    rng = np.random.default_rng(0)
    s, e, heads = 16, 8, 2
    hs = 4
    q = jnp.asarray(rng.normal(size=(2, s, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, s, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, s, e)), jnp.float32)
    ys, xs = np.meshgrid(np.arange(hs), np.arange(hs), indexing="ij")
    warp = jnp.asarray(np.stack([ys, xs], -1).astype(np.float32))  # identity
    m_obj = jnp.zeros((s,)).at[5].set(1.0)
    m_warp = jnp.zeros((s,)).at[10].set(1.0)

    m_amodal = jnp.zeros((s,)).at[11].set(1.0)
    out, losses = geodiff_attention(
        q, k, v, heads, warp, m_obj, m_warp, jnp.float32(1.0),
        is_cross=False, compute_losses=True, compute_removal=True,
        m_amodal=m_amodal,
    )
    assert out.shape == q.shape
    for name in ("sim", "movement", "removal", "smooth", "amodal"):
        assert name in losses and np.isfinite(float(losses[name]))

    # base stream is plain self-attention
    base_ref = sdpa(q[:1], k[:1], v[:1], heads)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(base_ref[0]),
                               atol=1e-5)

    # with share_gate=0 the edit stream is the live (k_base, v_base) attn
    out_off, _ = geodiff_attention(
        q, k, v, heads, warp, m_obj, m_warp, jnp.float32(0.0),
        is_cross=False, compute_losses=False, compute_removal=False,
    )
    live = sdpa(q[1:], k[:1], v[:1], heads)
    np.testing.assert_allclose(np.asarray(out_off[1]), np.asarray(live[0]),
                               atol=1e-5)


def test_geodiff_identity_warp_zero_movement_loss():
    """With an identity warp, identical streams and no gates, the reference
    output equals the live output -> sim/movement losses vanish."""
    rng = np.random.default_rng(1)
    s, e, heads = 16, 8, 2
    hs = 4
    x = jnp.asarray(rng.normal(size=(1, s, e)), jnp.float32)
    q = jnp.concatenate([x, x])
    k = jnp.concatenate([x, x])
    v = jnp.concatenate([x, x])
    ys, xs = np.meshgrid(np.arange(hs), np.arange(hs), indexing="ij")
    warp = jnp.asarray(np.stack([ys, xs], -1).astype(np.float32))
    zero = jnp.zeros((s,))
    _, losses = geodiff_attention(
        q, k, v, heads, warp, zero, zero, jnp.float32(1.0),
        is_cross=False, compute_losses=True, compute_removal=False,
    )
    assert float(losses["sim"]) < 1e-6
    assert float(losses["movement"]) < 1e-6


@pytest.mark.slow
def test_geo_diffuser_end_to_end_tiny():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    gd = GeoDiffuser(pipe)
    h = w = pipe.config.height
    img = np.random.default_rng(2).integers(0, 255, (h, w, 3), dtype=np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[16:32, 16:32] = 255
    out = gd.edit(img, mask, [12, 0, 0, 0, 0, 0, 1, 1, 1], steps=4)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()


def test_sum_losses_returns_raw_removal_and_applies_mult():
    from freefine_tpu.baselines.geo_diffuser import _sum_geodiff_losses

    inters = {"intermediates": {"down0": {"attn1": {
        "geodiff_removal": (jnp.float32(2.0),),
        "geodiff_sim": (jnp.float32(1.0),),
    }, "attn2": {"geodiff_removal": (jnp.float32(3.0),)}}}}
    t1, raw1 = _sum_geodiff_losses(inters, removal_self_mult=1.0)
    t2, raw2 = _sum_geodiff_losses(inters, removal_self_mult=2.0)
    # raw removal logs ONLY the self-attn layers (reference
    # loss_log_dict["self"]["removal"])
    assert float(raw1) == float(raw2) == 2.0
    # the multiplier scales only the self-removal weight: delta = w_self * L
    from freefine_tpu.baselines.geo_diffuser import LOSS_WEIGHTS

    np.testing.assert_allclose(
        float(t2 - t1), LOSS_WEIGHTS["removal"][0] * 2.0, rtol=1e-6
    )


def test_adaptive_schedule_matches_reference_branches():
    from freefine_tpu.baselines.geo_diffuser import adaptive_removal_schedule

    phase, expected = adaptive_removal_schedule(50)
    # optimization.py: p<0.4 -> targeted phase; 0.4<p<0.8 -> hold phase;
    # p==0.4 and p>=0.8 -> reset
    assert phase[0] == 0 and phase[19] == 0
    assert phase[20] == 2           # i/N == 0.4 falls to the reset branch
    assert phase[21] == 1 and phase[39] == 1
    assert (phase[40:] == 2).all()
    # expected removal target: -1.5 / 1.25^remaining, remaining=int((0.4-p)N)
    np.testing.assert_allclose(expected[0], -1.5 / 1.25 ** 20, rtol=1e-6)
    np.testing.assert_allclose(expected[19], -1.5 / 1.25, rtol=1e-6)
