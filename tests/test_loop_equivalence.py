"""Scan-loop equivalence: the jitted lax.scan pipelines must match explicit
Python step-by-step replicas that follow the reference's indexing literally
(forward_sampling model.py:577-618, _background_gen :753-792,
_compose :390-430, invert :873-890)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import EditConfig, EditState, build_mask_pyramid
from freefine_tpu.models.unet import UNet2DCondition
from freefine_tpu.pipeline import (
    ddim_invert_loop,
    sample_bggen_loop,
    sample_compose_loop,
    sample_edit_loop,
)
from freefine_tpu.schedulers.ddim import DDIMSchedule, ctrl_step, inv_step

NUM_STEP = 6
START = 3
K = NUM_STEP - START


@pytest.fixture(scope="module")
def env():
    cfg = tiny_pipeline_config()
    model = UNet2DCondition(config=cfg.unet)
    lh = cfg.latent_height
    ctx4 = jax.random.normal(jax.random.key(5),
                             (4, 77, cfg.unet.cross_attention_dim))
    params = model.init(
        jax.random.key(0), jnp.zeros((4, lh, lh, 4)), jnp.int32(1), ctx4
    )
    schedule = DDIMSchedule.create(num_inference_steps=NUM_STEP)
    mask = jnp.zeros((lh, lh)).at[2:5, 2:5].set(1.0)
    pyr = build_mask_pyramid(mask, lh, lh)
    state = EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr)
    return cfg, model, params, schedule, ctx4, mask, state


def _unet_plain(model):
    def f(p, lat, t, emb):
        return model.apply(p, lat, t, emb)
    return f


def _unet_edit(model, ecfg):
    def f(p, lat, t, emb, _e, st, extra=None):
        return model.apply(p, lat, t, emb, edit_cfg=ecfg, edit_state=st,
                           context_extra=extra)
    return f


def test_invert_equivalence(env):
    cfg, model, params, schedule, ctx4, mask, state = env
    lh = cfg.latent_height
    lat = jax.random.normal(jax.random.key(1), (2, lh, lh, 4)) * 0.2
    emb = ctx4[:2]
    traj = ddim_invert_loop(_unet_plain(model), params, schedule, lat, emb, K)

    # explicit replica (reference invert: i over reversed timesteps)
    x = lat
    want = [x]
    ts = np.asarray(schedule.timesteps)[::-1][:K]
    for t in ts:
        eps = model.apply(params, x, jnp.int32(int(t)), emb)
        x, _ = inv_step(schedule, eps, jnp.int32(int(t)), x)
        want.append(x)
    np.testing.assert_allclose(
        np.asarray(traj), np.asarray(jnp.stack(want)), atol=1e-5
    )


def test_edit_loop_equivalence(env):
    cfg, model, params, schedule, ctx4, mask, state = env
    lh = cfg.latent_height
    ecfg = EditConfig(mode="edit", method="tca")
    traj = jax.random.normal(jax.random.key(2), (K + 1, 2, lh, lh, 4)) * 0.3
    cg = jnp.linspace(1.0, 0.3, K)
    gates = jnp.ones((K,))
    rng = jax.random.key(7)
    g, eta = 7.5, 1.0

    got = sample_edit_loop(
        _unet_edit(model, ecfg), params, schedule, ecfg, traj, ctx4, state,
        cg, gates, mask, mask, rng,
        start_step=START, guidance_scale=g, eta=eta,
        local_text_edit=True, local_perturbation=True,
    )

    # explicit replica: reference forward_sampling indexing
    refer = jnp.flip(traj, axis=0)  # inverted_latents[::-1]
    lat = traj[-1]
    key = rng
    ts = np.asarray(schedule.timesteps)
    for i in range(START, NUM_STEP):
        j = i - START
        lat = lat.at[1:].set(refer[i - START + 1][1:])
        st = dataclasses.replace(state, context_guidance=cg[j], share_gate=gates[j])
        model_in = jnp.concatenate([lat, lat], 0)
        eps = model.apply(params, model_in, jnp.int32(int(ts[i])), ctx4,
                          edit_cfg=ecfg, edit_state=st)
        nu, nc = jnp.split(eps.astype(jnp.float32), 2, 0)
        noise = nu + g * (nc - nu) * mask[None, :, :, None]
        key, sub = jax.random.split(key)
        lat, _ = ctrl_step(schedule, noise, jnp.int32(int(ts[i])), lat, mask,
                           eta, sub, ddim_streams_from=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(lat), atol=1e-3)


def test_bggen_loop_equivalence(env):
    cfg, model, params, schedule, ctx4, mask, state = env
    lh = cfg.latent_height
    ecfg = EditConfig(mode="bggen", method="tca")
    traj = jax.random.normal(jax.random.key(3), (K + 1, 1, lh, lh, 4)) * 0.3
    cg = jnp.linspace(0.9, 0.2, K)
    gates = jnp.ones((K,))
    rng = jax.random.key(8)
    g, eta = 3.5, 1.0

    got = sample_bggen_loop(
        _unet_edit(model, ecfg), params, schedule, ecfg, traj, ctx4, state,
        cg, gates, mask, mask, rng,
        start_step=START, guidance_scale=g, eta=eta,
        local_text_edit=True, local_perturbation=True,
    )

    refer = jnp.flip(traj, axis=0)
    lat = traj[-1]
    key = rng
    ts = np.asarray(schedule.timesteps)
    for i in range(START, NUM_STEP):
        j = i - START
        # reference: refer_latents[i - start_step] of reversed list
        lat2 = jnp.concatenate([lat, refer[i - START]], 0)
        st = dataclasses.replace(state, context_guidance=cg[j], share_gate=gates[j])
        model_in = jnp.concatenate([lat2, lat2], 0)
        eps = model.apply(params, model_in, jnp.int32(int(ts[i])), ctx4,
                          edit_cfg=ecfg, edit_state=st)
        nu, nc = jnp.split(eps.astype(jnp.float32), 2, 0)
        noise = nu + g * (nc - nu) * mask[None, :, :, None]
        key, sub = jax.random.split(key)
        lat2, _ = ctrl_step(schedule, noise, jnp.int32(int(ts[i])), lat2, mask,
                            eta, sub, ddim_streams_from=1)
        lat = lat2[:1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(lat), atol=1e-3)


def test_compose_loop_equivalence(env):
    cfg, model, params, schedule, ctx4, mask, state0 = env
    lh = cfg.latent_height
    n = 2
    ecfg = EditConfig(mode="compose", method="tca", num_sources=n,
                      num_streams=n + 2, prompt_length=2)
    traj = jax.random.normal(jax.random.key(4), (K + 1, n + 1, lh, lh, 4)) * 0.3
    ctx = jnp.tile(ctx4[:1], (n + 2, 1, 1))
    extra = ctx4[:2]
    src = jnp.stack([mask, 1 - mask])
    tgt = jnp.stack([mask, 1 - mask, mask])
    from freefine_tpu.edit import build_mask_stack_pyramid

    state = EditState(
        src_masks=build_mask_stack_pyramid(src, lh, lh),
        tgt_masks=build_mask_stack_pyramid(tgt, lh, lh),
    )
    cg = jnp.linspace(0.8, 0.1, K)
    gates = jnp.ones((K,))
    rng = jax.random.key(9)
    g, eta = 7.5, 1.0

    got = sample_compose_loop(
        _unet_edit(model, ecfg), params, schedule, ecfg, traj, ctx, extra,
        state, cg, gates, mask, mask, rng,
        start_step=START, guidance_scale=g, eta=eta,
        local_text_edit=True, local_perturbation=True,
    )

    refer = jnp.flip(traj, axis=0)
    lat = traj[-1][:1]
    key = rng
    ts = np.asarray(schedule.timesteps)
    for i in range(START, NUM_STEP):
        j = i - START
        lat_full = jnp.concatenate([lat, refer[i - START + 1][1:]], 0)
        st = dataclasses.replace(state, context_guidance=cg[j],
                                 share_gate=gates[j])
        model_in = jnp.concatenate([lat_full, lat], 0)
        eps = model.apply(params, model_in, jnp.int32(int(ts[i])), ctx,
                          edit_cfg=ecfg, edit_state=st, context_extra=extra)
        eps = eps.astype(jnp.float32)
        noise = eps[:1] + g * (eps[-1:] - eps[:1]) * mask[None, :, :, None]
        key, sub = jax.random.split(key)
        lat, _ = ctrl_step(schedule, noise, jnp.int32(int(ts[i])), lat, mask,
                           eta, sub)
    np.testing.assert_allclose(np.asarray(got), np.asarray(lat), atol=1e-3)
