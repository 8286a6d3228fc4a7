"""SDXL-class UNet shape test (tiny proportions of the SDXL topology)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import UNetConfig, sdxl_unet_config
from freefine_tpu.models.unet import UNet2DCondition


def test_sdxl_config_shape():
    cfg = sdxl_unet_config()
    assert cfg.transformer_depth == (1, 2, 10)
    assert cfg.cross_attention_dim == 2048
    assert cfg.addition_embed_dim == 2816


@pytest.mark.slow
def test_sdxl_topology_tiny_forward():
    """A scaled-down SDXL topology (3 levels, depths (1,2,3), added cond,
    linear transformer projections) runs and produces the right shape."""
    cfg = UNetConfig(
        sample_size=16,
        block_out_channels=(16, 32, 64),
        layers_per_block=2,
        num_attention_heads=2,
        cross_attention_dim=32,
        down_block_has_attn=(False, True, True),
        up_block_has_attn=(True, True, False),
        transformer_depth=(1, 2, 3),
        addition_embed_dim=24,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    model = UNet2DCondition(config=cfg)
    sample = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 77, 32))
    added = jnp.zeros((2, 24))
    params = model.init(
        jax.random.key(0), sample, jnp.int32(1), ctx, added_cond=added
    )
    out = model.apply(
        params, jnp.ones((2, 16, 16, 4)), jnp.int32(10), ctx, added_cond=added
    )
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()

    # added conditioning must influence the output
    out2 = model.apply(
        params, jnp.ones((2, 16, 16, 4)), jnp.int32(10), ctx,
        added_cond=added + 1.0,
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))
