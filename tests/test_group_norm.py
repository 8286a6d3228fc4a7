"""Fused GroupNorm(+SiLU) kernel: parity vs the XLA reference math,
gradient path, gating, and module-level equivalence with flax GroupNorm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.ops.group_norm import (
    group_norm_reference,
    group_norm_silu,
    use_fused,
)


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    # interpret-mode pallas on CPU; exercises the real kernel logic
    monkeypatch.setenv("FREEFINE_FUSED_GN", "1")


def _case(b=2, h=8, w=8, c=64, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)) * 2 + 0.5, dtype)
    scale = jnp.asarray(rng.normal(size=(c,)) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.2, jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize("apply_silu", [False, True])
@pytest.mark.parametrize("groups", [8, 32])
def test_fused_matches_reference(apply_silu, groups):
    x, scale, bias = _case(c=64)
    got = group_norm_silu(x, scale, bias, num_groups=groups,
                          apply_silu=apply_silu)
    want = group_norm_reference(x, scale, bias, num_groups=groups,
                                apply_silu=apply_silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_bf16_io():
    x, scale, bias = _case(dtype=jnp.bfloat16)
    got = group_norm_silu(x, scale, bias, num_groups=8)
    want = group_norm_reference(x, scale, bias, num_groups=8)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2,
    )


def test_reference_matches_flax_group_norm():
    import flax.linen as nn

    x, scale, bias = _case(c=32)
    want = nn.GroupNorm(num_groups=8, epsilon=1e-5, use_bias=True,
                        use_scale=True).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    got = group_norm_reference(x, scale, bias, num_groups=8,
                               apply_silu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradient_flows_through_fused():
    x, scale, bias = _case(b=1, h=8, w=8, c=16)

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, num_groups=4) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(
            group_norm_reference(x, s, b, num_groups=4) ** 2
        )

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_gating(monkeypatch):
    monkeypatch.setenv("FREEFINE_FUSED_GN", "0")
    assert not use_fused((1, 8, 8, 32))
    monkeypatch.setenv("FREEFINE_FUSED_GN", "1")
    assert use_fused((1, 64, 64, 320))
    # a 512^2 VAE slab never fits
    assert not use_fused((1, 512, 512, 128))
    monkeypatch.setenv("FREEFINE_FUSED_GN", "auto")
    # auto never engages off-TPU
    if jax.default_backend() != "tpu":
        assert not use_fused((1, 8, 8, 32))


def test_module_groupnorm32_same_output_and_new_param_layout():
    """GroupNorm32 now owns scale/bias directly (no GroupNorm_0 wrapper)
    and produces the flax GroupNorm output."""
    import flax.linen as nn

    from freefine_tpu.models.layers import GroupNorm32

    x, scale, bias = _case(c=32)
    m = GroupNorm32(num_groups=8)
    params = m.init(jax.random.key(0), x)
    assert set(params["params"].keys()) == {"scale", "bias"}
    params = {"params": {"scale": scale, "bias": bias}}
    got = m.apply(params, x)
    want = nn.GroupNorm(num_groups=8, epsilon=1e-5).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # fused silu call path
    got2 = m.apply(params, x, silu=True)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want) * jax.nn.sigmoid(np.asarray(want)),
        atol=1e-5, rtol=1e-5,
    )
