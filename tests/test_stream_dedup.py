"""Deduped 3-stream CFG layout equivalence.

The reference's edit/bggen sampling batch is 4 streams [u_e, u_r, c_e, c_r]
(forward_sampling, model.py:536-564), but both reference streams receive the
same latents AND the same ("") prompt, so c_r == u_r by construction (the
local-CFG cross-attn even hard-replaces c_r's output with u_r's,
attention.py:1391).  The pipelines therefore default to a deduped 3-stream
layout [u_e, r, c_e] — 25% less sampling-UNet compute — and these tests pin
that the deduped loops match the legacy 4-stream layout (up to batch-3 vs
batch-4 XLA reduction-order float noise, ~1e-5/step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import EditConfig, EditState, build_mask_pyramid
from freefine_tpu.models.unet import UNet2DCondition
from freefine_tpu.pipeline import sample_bggen_loop, sample_edit_loop

NUM_STEP = 5
START = 2
K = NUM_STEP - START


@pytest.fixture(scope="module")
def env():
    cfg = tiny_pipeline_config()
    model = UNet2DCondition(config=cfg.unet)
    lh = cfg.latent_height
    d = cfg.unet.cross_attention_dim
    uncond = jax.random.normal(jax.random.key(11), (77, d))
    cond = jax.random.normal(jax.random.key(12), (77, d))
    text4 = jnp.stack([uncond, uncond, cond, uncond])  # legacy [u,u,c,""]
    text3 = jnp.stack([uncond, uncond, cond])          # deduped [u, r, c]
    params = model.init(
        jax.random.key(0), jnp.zeros((4, lh, lh, 4)), jnp.int32(1), text4
    )
    from freefine_tpu.schedulers.ddim import DDIMSchedule

    schedule = DDIMSchedule.create(num_inference_steps=NUM_STEP)
    mask = jnp.zeros((lh, lh)).at[2:5, 2:5].set(1.0)
    pyr = build_mask_pyramid(mask, lh, lh)
    state = EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr)
    return cfg, model, params, schedule, text3, text4, mask, state


def _unet_edit(model, ecfg):
    def f(p, lat, t, emb, _e, st, extra=None):
        return model.apply(p, lat, t, emb, edit_cfg=ecfg, edit_state=st,
                           context_extra=extra)
    return f


@pytest.mark.parametrize("local_text_edit", [True, False])
def test_edit_loop_dedup_matches_legacy(env, local_text_edit):
    cfg, model, params, schedule, text3, text4, mask, state = env
    lh = cfg.latent_height
    ecfg = EditConfig(mode="edit", method="tca")
    traj = jax.random.normal(jax.random.key(2), (K + 1, 2, lh, lh, 4)) * 0.3
    cg = jnp.linspace(1.0, 0.3, K)
    gates = jnp.ones((K,))
    rng = jax.random.key(7)

    kw = dict(start_step=START, guidance_scale=7.5, eta=1.0,
              local_text_edit=local_text_edit, local_perturbation=True)
    fn = _unet_edit(model, ecfg)
    got3 = sample_edit_loop(fn, params, schedule, ecfg, traj, text3, state,
                            cg, gates, mask, mask, rng, **kw)
    got4 = sample_edit_loop(fn, params, schedule, ecfg, traj, text4, state,
                            cg, gates, mask, mask, rng, **kw)
    np.testing.assert_allclose(
        np.asarray(got3), np.asarray(got4), atol=1e-3
    )


def test_bggen_loop_dedup_matches_legacy(env):
    cfg, model, params, schedule, text3, text4, mask, state = env
    lh = cfg.latent_height
    ecfg = EditConfig(mode="bggen", method="tca")
    traj = jax.random.normal(jax.random.key(3), (K + 1, 1, lh, lh, 4)) * 0.3
    cg = jnp.linspace(0.9, 0.2, K)
    gates = jnp.ones((K,))
    rng = jax.random.key(8)

    kw = dict(start_step=START, guidance_scale=3.5, eta=1.0,
              local_text_edit=True, local_perturbation=True)
    fn = _unet_edit(model, ecfg)
    got3 = sample_bggen_loop(fn, params, schedule, ecfg, traj, text3, state,
                             cg, gates, mask, mask, rng, **kw)
    got4 = sample_bggen_loop(fn, params, schedule, ecfg, traj, text4, state,
                             cg, gates, mask, mask, rng, **kw)
    np.testing.assert_allclose(
        np.asarray(got3), np.asarray(got4), atol=1e-3
    )


def test_edit_loop_dedup_with_intermediates(env):
    """return_intermediates path must agree too (edit-stream latents)."""
    cfg, model, params, schedule, text3, text4, mask, state = env
    lh = cfg.latent_height
    ecfg = EditConfig(mode="edit", method="tca")
    traj = jax.random.normal(jax.random.key(4), (K + 1, 2, lh, lh, 4)) * 0.3
    cg = jnp.linspace(1.0, 0.3, K)
    gates = jnp.ones((K,))
    rng = jax.random.key(9)
    kw = dict(start_step=START, guidance_scale=7.5, eta=1.0,
              local_text_edit=True, local_perturbation=True,
              return_intermediates=True)
    fn = _unet_edit(model, ecfg)
    f3, i3 = sample_edit_loop(fn, params, schedule, ecfg, traj, text3, state,
                              cg, gates, mask, mask, rng, **kw)
    f4, i4 = sample_edit_loop(fn, params, schedule, ecfg, traj, text4, state,
                              cg, gates, mask, mask, rng, **kw)
    np.testing.assert_allclose(np.asarray(f3), np.asarray(f4), atol=1e-3)
    np.testing.assert_allclose(np.asarray(i3), np.asarray(i4), atol=1e-3)


@pytest.mark.parametrize("method", ["sdsa", "ssa"])
def test_edit_loop_dedup_style_align(env, method):
    """The KV-append style-align methods must agree 3- vs 4-stream too
    (_style_align_attention builds per-layout row masks)."""
    cfg, model, params, schedule, text3, text4, mask, state = env
    lh = cfg.latent_height
    ecfg = EditConfig(mode="edit", method=method)
    traj = jax.random.normal(jax.random.key(5), (K + 1, 2, lh, lh, 4)) * 0.3
    cg = jnp.zeros((K,))
    gates = jnp.ones((K,))
    rng = jax.random.key(10)
    kw = dict(start_step=START, guidance_scale=7.5, eta=1.0,
              local_text_edit=True, local_perturbation=True)
    fn = _unet_edit(model, ecfg)
    got3 = sample_edit_loop(fn, params, schedule, ecfg, traj, text3, state,
                            cg, gates, mask, mask, rng, **kw)
    got4 = sample_edit_loop(fn, params, schedule, ecfg, traj, text4, state,
                            cg, gates, mask, mask, rng, **kw)
    np.testing.assert_allclose(
        np.asarray(got3), np.asarray(got4), atol=1e-3
    )


def test_guided_loop_dedup_matches_legacy(env):
    """sample_guided_loop (DragonDiffusion-style energy guidance) must
    agree 3- vs 4-stream, including the energy term (text_emb[2:3] is the
    cond row in both layouts)."""
    from freefine_tpu.pipeline import sample_guided_loop

    cfg, model, params, schedule, text3, text4, mask, state = env
    lh = cfg.latent_height
    ecfg = EditConfig(mode="edit", method="tca")
    traj = jax.random.normal(jax.random.key(6), (K + 1, 2, lh, lh, 4)) * 0.3
    cg = jnp.linspace(1.0, 0.3, K)
    gates = jnp.ones((K,))
    rng = jax.random.key(11)
    hw = (lh * 2, lh * 2)
    mask_cur = jnp.zeros(hw).at[4:10, 4:10].set(1.0)
    emasks = (mask_cur, 1.0 - mask_cur, jnp.ones(hw))

    def unet_feat(p, s, t, emb, return_features=False):
        return model.apply(p, s, t, emb, return_features=return_features)

    fn = _unet_edit(model, ecfg)
    kw = dict(start_step=START, guidance_scale=7.5, eta=1.0,
              energy_scale=0.5, energy_until=K - 1)
    got3 = sample_guided_loop(fn, unet_feat, params, schedule, ecfg, traj,
                              text3, state, cg, gates, mask, mask, emasks,
                              rng, **kw)
    got4 = sample_guided_loop(fn, unet_feat, params, schedule, ecfg, traj,
                              text4, state, cg, gates, mask, mask, emasks,
                              rng, **kw)
    np.testing.assert_allclose(
        np.asarray(got3), np.asarray(got4), atol=1e-3
    )
