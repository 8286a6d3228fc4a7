"""UNet structural tests on the tiny config (CPU, seconds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import (
    EditConfig,
    EditState,
    build_mask_pyramid,
    attention_resolutions,
    none_config,
)
from freefine_tpu.models.unet import UNet2DCondition


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_pipeline_config()
    model = UNet2DCondition(config=cfg.unet)
    lh, lw = cfg.latent_height, cfg.latent_width
    sample = jnp.zeros((4, lh, lw, 4), jnp.float32)
    context = jnp.zeros((4, 77, cfg.unet.cross_attention_dim), jnp.float32)
    params = model.init(jax.random.key(0), sample, jnp.int32(1), context)
    return cfg, model, params


def test_num_transformer_blocks_is_16(tiny):
    cfg, _, _ = tiny
    assert cfg.unet.num_transformer_blocks == 16


def test_forward_shape(tiny):
    cfg, model, params = tiny
    lh, lw = cfg.latent_height, cfg.latent_width
    sample = jnp.ones((4, lh, lw, 4), jnp.float32)
    context = jnp.ones((4, 77, cfg.unet.cross_attention_dim), jnp.float32)
    out = model.apply(params, sample, jnp.int32(10), context)
    assert out.shape == (4, lh, lw, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_with_edit_state(tiny):
    cfg, model, params = tiny
    lh, lw = cfg.latent_height, cfg.latent_width
    sample = jnp.ones((4, lh, lw, 4), jnp.float32)
    context = jnp.ones((4, 77, cfg.unet.cross_attention_dim), jnp.float32)

    mask = jnp.zeros((lh, lw)).at[2:5, 2:5].set(1.0)
    pyr = build_mask_pyramid(mask, lh, lw)
    state = EditState(
        fg_retain=pyr, fg_ref=pyr, local_region=pyr,
        context_guidance=jnp.float32(0.8),
    )
    ecfg = EditConfig(mode="edit", method="tca")
    out = model.apply(
        params, sample, jnp.int32(10), context,
        edit_cfg=ecfg, edit_state=state,
    )
    assert out.shape == (4, lh, lw, 4)
    assert np.isfinite(np.asarray(out)).all()

    # Editing must actually change the edit streams vs no-edit...
    base = model.apply(params, sample, jnp.int32(10), context)
    assert not np.allclose(np.asarray(out[0]), np.asarray(base[0]), atol=1e-6)


def test_jit_single_compile_over_steps(tiny):
    """The denoise-step UNet call must not retrace across timesteps/masks."""
    cfg, model, params = tiny
    lh, lw = cfg.latent_height, cfg.latent_width
    context = jnp.ones((4, 77, cfg.unet.cross_attention_dim), jnp.float32)
    ecfg = EditConfig(mode="edit", method="tca")

    traces = 0

    @jax.jit
    def step(params, sample, t, state):
        nonlocal traces
        traces += 1
        return model.apply(
            params, sample, t, context, edit_cfg=ecfg, edit_state=state
        )

    mask = jnp.zeros((lh, lw)).at[1:3, 1:3].set(1.0)
    pyr = build_mask_pyramid(mask, lh, lw)
    state = EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr)
    sample = jnp.ones((4, lh, lw, 4), jnp.float32)
    for t in (981, 961, 941):
        mask2 = jnp.zeros((lh, lw)).at[0:2, 0:2].set(1.0)
        pyr2 = build_mask_pyramid(mask2, lh, lw)
        state = EditState(
            fg_retain=pyr2, fg_ref=pyr2, local_region=pyr2,
            context_guidance=jnp.float32(t / 1000.0),
        )
        sample = step(params, sample, jnp.int32(t), state)
    assert traces == 1


def test_mid_feature_replacement(tiny):
    cfg, model, params = tiny
    lh, lw = cfg.latent_height, cfg.latent_width
    sample = jnp.ones((4, lh, lw, 4), jnp.float32)
    context = jnp.ones((4, 77, cfg.unet.cross_attention_dim), jnp.float32)
    mid_ch = cfg.unet.block_out_channels[-1]
    mh = lh // 8
    h_sample = jnp.zeros((2, mh, mh, mid_ch), jnp.float32)
    out, feats = model.apply(
        params, sample, jnp.int32(10), context,
        h_sample=h_sample, return_features=True,
    )
    assert out.shape == (4, lh, lw, 4)
    assert feats[0].shape == (4, mh, mh, mid_ch)
    # Mid replacement applies to streams 0 and 2 only.
    np.testing.assert_allclose(np.asarray(feats[0][0]), 0.0)
    np.testing.assert_allclose(np.asarray(feats[0][2]), 0.0)
    assert not np.allclose(np.asarray(feats[0][1]), 0.0)


def test_mask_pyramid_resolutions():
    res = attention_resolutions(64, 64)
    assert res == ((64, 64), (32, 32), (16, 16), (8, 8))
    mask = jnp.zeros((64, 64)).at[:32].set(1.0)
    pyr = build_mask_pyramid(mask, 64, 64)
    assert set(pyr.keys()) == {64 * 64, 32 * 32, 16 * 16, 8 * 8}
    np.testing.assert_allclose(np.asarray(pyr[64]).reshape(8, 8)[:4].mean(), 1.0)
    np.testing.assert_allclose(np.asarray(pyr[64]).reshape(8, 8)[4:].mean(), 0.0)
