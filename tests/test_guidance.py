"""Energy-guidance tests on the tiny UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.models.unet import UNet2DCondition
from freefine_tpu.ops.guidance import (
    energy_guidance,
    global_masked_cosine,
    masked_cosine,
    move_energy,
    warp_features,
)


def test_masked_cosine_values(rng_np):
    a = jnp.asarray(rng_np.normal(size=(4, 4, 8)).astype(np.float32))
    mask = jnp.zeros((4, 4)).at[0, 0].set(1.0)
    np.testing.assert_allclose(float(masked_cosine(a, a, mask)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(masked_cosine(a, -a, mask)), -1.0, atol=1e-5)


def test_global_masked_cosine_identity(rng_np):
    a = jnp.asarray(rng_np.normal(size=(4, 4, 8)).astype(np.float32))
    m = jnp.ones((4, 4))
    np.testing.assert_allclose(float(global_masked_cosine(a, a, m, m)), 1.0, atol=1e-5)


def test_warp_features_identity(rng_np):
    f = jnp.asarray(rng_np.normal(size=(6, 6, 3)).astype(np.float32))
    eye = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    np.testing.assert_allclose(np.asarray(warp_features(f, eye)), np.asarray(f), atol=1e-5)


@pytest.fixture(scope="module")
def unet_setup():
    cfg = tiny_pipeline_config()
    model = UNet2DCondition(config=cfg.unet)
    lh = cfg.latent_height
    sample = jnp.zeros((1, lh, lh, 4), jnp.float32)
    ctx = jnp.zeros((1, 77, cfg.unet.cross_attention_dim), jnp.float32)
    params = model.init(jax.random.key(0), sample, jnp.int32(1), ctx)

    def unet_apply(p, s, t, emb, return_features=False):
        return model.apply(p, s, t, emb, return_features=return_features)

    return cfg, unet_apply, params, ctx


def test_move_energy_finite_and_grad_nonzero(unet_setup):
    cfg, unet_apply, params, ctx = unet_setup
    lh = cfg.latent_height
    latent = jnp.ones((1, lh, lh, 4)) * 0.1
    ref = jnp.ones((1, lh, lh, 4)) * 0.2
    hw = (lh, lh)
    mask_cur = jnp.zeros(hw).at[2:5, 2:5].set(1.0)
    mask_other = 1.0 - mask_cur
    mask_no = jnp.zeros(hw).at[6:8, 6:8].set(1.0)

    e = move_energy(
        unet_apply, params, latent, ref, jnp.int32(100), ctx,
        feature_indices=(1, 2), target_hw=hw, inv_warp=None,
        mask_cur=mask_cur, mask_other=mask_other, mask_non_overlap=mask_no,
    )
    assert np.isfinite(float(e))

    g = energy_guidance(
        unet_apply, params, latent, ref, jnp.int32(100), ctx,
        energy_scale=2.0, guidance_mask=mask_cur,
        feature_indices=(1, 2), target_hw=hw, inv_warp=None,
        mask_cur=mask_cur, mask_other=mask_other, mask_non_overlap=mask_no,
    )
    assert g.shape == latent.shape
    gn = np.asarray(g)
    assert np.isfinite(gn).all() and np.abs(gn).max() > 0
