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


def test_sdxl_head_partitioning():
    """SDXL fixes head_dim=64 -> per-level heads (5, 10, 20); SD-1.5 fixes
    the head COUNT at 8.  Weight shapes are identical either way, so only
    this pin (not the key/shape manifests) guards the softmax grouping that
    real-checkpoint parity depends on (diffusers SDXL-base unet config:
    attention_head_dim=[5, 10, 20], use_linear_projection=true)."""
    from freefine_tpu.config import sd15_pipeline_config

    cfg = sdxl_unet_config()
    assert cfg.head_dim == 64 and cfg.use_linear_projection
    assert tuple(c // cfg.head_dim for c in cfg.block_out_channels) == (5, 10, 20)

    sd15 = sd15_pipeline_config().unet
    assert sd15.head_dim is None and sd15.num_attention_heads == 8
    assert not sd15.use_linear_projection


def test_head_dim_forward_tiny():
    """head_dim-derived per-level heads actually run: (32,64,128)//16 ->
    (2, 4, 8) heads, and the partitioning changes the output vs a fixed
    head count with identical weights."""
    cfg = UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64, 128),
        layers_per_block=1,
        head_dim=16,
        cross_attention_dim=32,
        down_block_has_attn=(False, True, True),
        up_block_has_attn=(True, True, False),
        transformer_depth=(1, 1, 1),
        use_linear_projection=True,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    model = UNet2DCondition(config=cfg)
    sample = jnp.ones((1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (1, 77, 32))
    params = model.init(jax.random.key(0), sample, jnp.int32(1), ctx)
    out = model.apply(params, sample, jnp.int32(10), ctx)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()

    # same weights, fixed 2 heads everywhere -> different softmax grouping
    cfg2 = dataclasses.replace(cfg, head_dim=None, num_attention_heads=2)
    out2 = UNet2DCondition(config=cfg2).apply(params, sample, jnp.int32(10), ctx)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


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
        use_linear_projection=True,
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


def test_tca_layer_range_covers_decoder_every_backbone():
    """The TCA gate must select decoder layers on EVERY backbone.  Layer
    indices are depth-weighted (each SpatialTransformer advances
    block_index by its transformer depth), so SDXL has 70 — the fixed SD
    range (10, 16) selected nothing there (TCA silently inert); the range
    now rescales to the reference's decoder fraction
    (UNetConfig.attn_layer_layout)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from freefine_tpu.config import (
        sd15_pipeline_config,
        sd21_pipeline_config,
        sdxl_pipeline_config,
        tiny_pipeline_config,
        tiny_sdxl_pipeline_config,
    )
    from freefine_tpu.pipeline import FreeFine
    from freefine_tpu.sdxl import SDXLFreeFine

    # layouts: (total, up_start) in depth-weighted indices
    assert sd15_pipeline_config().unet.attn_layer_layout == (16, 7)
    assert sd21_pipeline_config().unet.attn_layer_layout == (16, 7)
    assert sdxl_pipeline_config().unet.attn_layer_layout == (70, 34)

    for cfg, cls, want in [
        (tiny_pipeline_config(), FreeFine, (10, 16)),
        (tiny_sdxl_pipeline_config(), SDXLFreeFine, (14, 22)),
    ]:
        pipe = cls(config=cfg, params={})
        assert pipe._layer_range == want
        total, up_start = cfg.unet.attn_layer_layout
        lo, hi = pipe._layer_range
        assert up_start <= lo < hi == total  # gate inside the decoder

    # the full SDXL pipeline must derive (44, 70) — the reference's
    # 10-of-16 decoder fraction on the 70-layer layout
    pipe = SDXLFreeFine(config=sdxl_pipeline_config(), params={})
    assert pipe._layer_range == (44, 70)
