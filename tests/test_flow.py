"""Correlation-volume op tests vs naive numpy references."""

import jax.numpy as jnp
import numpy as np

from freefine_tpu.ops.flow import (
    avg_pool2,
    corr_block,
    corr_lookup,
    corr_pyramid,
    correlation_volume,
)


def test_correlation_volume_matches_naive():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    f2 = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    corr = np.asarray(correlation_volume(jnp.asarray(f1), jnp.asarray(f2)))
    naive = np.einsum("bijc,bklc->bijkl", f1, f2) / np.sqrt(8.0)
    np.testing.assert_allclose(corr, naive, rtol=1e-5, atol=1e-5)


def test_avg_pool2():
    x = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4)
    out = np.asarray(avg_pool2(jnp.asarray(x)))
    expect = x.reshape(2, 2, 2, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(out, expect)


def test_corr_lookup_identity_coords():
    # identity coords at radius 0 must return the diagonal of the volume
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    f2 = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    corr = correlation_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr_pyramid(corr, num_levels=1)

    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    coords = jnp.asarray(
        np.stack([xs, ys], -1)[None].astype(np.float32)
    )
    out = np.asarray(corr_lookup(pyr, coords, radius=0))  # [1, 4, 4, 1]
    naive = np.asarray(corr)[0]
    diag = naive[ys, xs, ys, xs]
    np.testing.assert_allclose(out[0, :, :, 0], diag, rtol=1e-5, atol=1e-5)


def test_corr_block_shapes_and_padding():
    rng = np.random.default_rng(2)
    f1 = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    coords = jnp.asarray(
        np.tile(np.stack([xs, ys], -1)[None], (2, 1, 1, 1)).astype(np.float32)
    )
    out = corr_block(f1, f2, coords, num_levels=3, radius=2)
    assert out.shape == (2, 8, 8, 3 * 5 * 5)
    assert np.isfinite(np.asarray(out)).all()
    # out-of-bounds window cells are zero-padded: the top-left pixel's
    # window at level 0 has zero entries in its first row/col
    first_win = np.asarray(out)[0, 0, 0, : 5 * 5].reshape(5, 5)
    assert np.all(first_win[:2, :] == 0) and np.all(first_win[:, :2] == 0)
