"""Sequence-parallel attention vs the unsharded op on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.ops.attention import masked_sdpa
from freefine_tpu.parallel import sp, tp


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(7)
    b, s, e = 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    rows = jnp.asarray(rng.integers(0, 2, (b, s)), jnp.float32)
    # never a fully-masked key set
    rows = rows.at[:, 0].set(1.0)
    return q, k, v, rows


@pytest.mark.parametrize("n_model", [2, 4])
def test_matches_unsharded(qkv, n_model):
    q, k, v, rows = qkv
    mesh = tp.make_mesh(n_model=n_model)
    ref = masked_sdpa(q, k, v, heads=4, key_rows=rows)
    out = jax.jit(
        lambda q, k, v, r: sp.sequence_parallel_sdpa(
            q, k, v, 4, mesh, key_rows=r
        )
    )(q, k, v, rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.shape == q.shape


def test_no_mask_and_cross_lengths(qkv):
    q, k, v, _ = qkv
    mesh = tp.make_mesh(n_model=4)
    # cross-length: 256 queries against 128 keys (both divide 4)
    k2, v2 = k[:, :128], v[:, :128]
    ref = masked_sdpa(q, k2, v2, heads=4)
    out = sp.sequence_parallel_sdpa(q, k2, v2, 4, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rejects_indivisible(qkv):
    q, k, v, _ = qkv
    mesh = tp.make_mesh(n_model=4)
    with pytest.raises(ValueError):
        sp.sequence_parallel_sdpa(q[:, :130], k, v, 4, mesh)


def test_output_stays_token_sharded(qkv):
    q, k, v, rows = qkv
    mesh = tp.make_mesh(n_model=4)
    sh = sp.token_sharding(mesh)
    qd = jax.device_put(q, sh)
    out = jax.jit(
        lambda q, k, v, r: sp.sequence_parallel_sdpa(
            q, k, v, 4, mesh, key_rows=r
        ),
        out_shardings=sh,
    )(qd, k, v, rows)
    ref = masked_sdpa(q, k, v, heads=4, key_rows=rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
