"""SelfGuidance baseline core tests: energy primitives, guidance schedule,
DDPM step math, token selection, map sowing, and the e2e tiny edit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.baselines.self_guidance import (
    SelfGuidance,
    attn_diff_norm,
    ddpm_step,
    fix_sizes,
    get_centroid,
    get_size,
    guidance_gates,
    position_deltas,
    silhouette_loss,
    soft_centroid,
    threshold_attention,
)
from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import EditConfig, EditState
from freefine_tpu.pipeline import FreeFine
from freefine_tpu.schedulers.ddim import DDIMSchedule


def test_threshold_attention_range():
    a = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 3)))
    t = threshold_attention(a)
    assert float(t.min()) >= 0.0 and float(t.max()) <= 1.0 + 1e-6


def test_get_centroid_peak():
    # a delta map's centroid is the peak location
    a = np.zeros((1, 64, 1), np.float32)
    a[0, 5 * 8 + 3, 0] = 1.0  # (y=5, x=3) on an 8x8 grid
    c = get_centroid(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(c[:, 0]), [3.0, 5.0], atol=1e-5)


def test_soft_centroid_normalised():
    a = np.zeros((1, 8, 8, 1), np.float32)
    a[0, 4, 2, 0] = 1.0
    c = soft_centroid(jnp.asarray(a))
    # the ports keep the reference's +1e-4 normalisation epsilon
    # (guidance_functions.py:208), hence the loose tolerance
    np.testing.assert_allclose(np.asarray(c[0, 0]), [2 / 7, 4 / 7], atol=1e-3)


def test_size_monotone():
    small = np.zeros((1, 16, 16), np.float32); small[0, 4:6, 4:6] = 1.0
    big = np.zeros((1, 16, 16), np.float32); big[0, 2:12, 2:12] = 1.0
    s1 = float(get_size(jnp.asarray(small.reshape(1, 256, 1))))
    s2 = float(get_size(jnp.asarray(big.reshape(1, 256, 1))))
    assert s2 > s1


def test_fix_sizes_and_position_deltas_zero_at_identity():
    a = jnp.asarray(np.random.default_rng(1).random((2, 64, 2)), jnp.float32)
    assert abs(float(fix_sizes([a], [a]))) < 1e-6
    assert abs(float(position_deltas([a], [a]))) < 1e-5


def test_guidance_gates_shape_and_schedule():
    g = guidance_gates(50, "ddpm")
    assert g.shape == (50,)
    assert g[:16].all()            # early steps always guided (i <= 5T/16)
    assert g[-1] == 0              # tail unguided
    assert g[20] == 1 and g[21] == 0  # alternation in the middle


def test_ddpm_step_statistics():
    # stepping pure noise with the true eps keeps magnitudes bounded
    schedule = DDIMSchedule.create(num_inference_steps=10)
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    eps = jnp.zeros_like(x)
    out = ddpm_step(schedule, eps, jnp.int32(901), x, rng)
    assert np.isfinite(np.asarray(out)).all()
    # final step (t below delta) adds no variance noise
    out_final = ddpm_step(schedule, eps, jnp.int32(1), x, rng)
    a_t = float(schedule.alpha_at(jnp.int32(1)))
    expect = np.asarray(x) / np.sqrt(a_t) * np.sqrt(a_t)  # mean-only path
    assert np.isfinite(np.asarray(out_final)).all()


def test_silhouette_loss_small_at_identity_transform():
    maps = [jnp.asarray(np.random.default_rng(2).random((2, 64, 1)), jnp.float32)]
    f = jnp.zeros((1, 4, 4, 8), jnp.float32)
    # identity transform of identical maps toward themselves: the loss is
    # NOT exactly zero — the reference samples through grid_sample's
    # align_corners=False grid (a ~half-pixel resample we replicate
    # exactly; tests/test_reference_golden_baselines.py pins it) — but it
    # must be small and finite
    loss = silhouette_loss(maps, maps, f, f, appearance_weight=0.0,
                           rot=0.0, sy=1.0, sx=1.0, dy=0.0, dx=0.0)
    assert np.isfinite(float(loss)) and float(loss) < 0.25


def test_token_select_positions():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    sg = SelfGuidance(pipe)
    sel = sg.token_select("a photo of a cat", "cat")
    assert sel.shape == (8, 77)
    assert sel.sum() >= 1          # object token found
    rows = sel.sum(axis=1)
    assert ((rows == 0) | (rows == 1)).all()  # one-hot or padding


def test_sow_token_attn_shapes():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    cfg = pipe.config
    lh, lw = cfg.latent_height, cfg.latent_width
    sel = jnp.zeros((4, 77), jnp.float32).at[0, 3].set(1.0)
    state = EditState(token_select=sel)
    ecfg = EditConfig(mode="none", method=None, local_cfg=False,
                      sow_token_attn=True)
    lat = jnp.zeros((2, lh, lw, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, cfg.unet.cross_attention_dim), jnp.float32)
    out, inter = pipe.unet.apply(
        pipe.params["unet"], lat, jnp.int32(1), ctx,
        edit_cfg=ecfg, edit_state=state, mutable=["intermediates"],
    )
    leaves = jax.tree_util.tree_leaves(inter)
    assert leaves, "sow produced no intermediates"
    # token maps end in T_sel = 4; feature tap is 4D
    assert any(l.ndim == 3 and l.shape[-1] == 4 for l in leaves)
    assert any(l.ndim == 4 for l in leaves)


@pytest.mark.slow
def test_self_guidance_end_to_end_tiny():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    sg = SelfGuidance(pipe)
    h = w = pipe.config.height
    img = np.random.default_rng(3).integers(0, 255, (h, w, 3), dtype=np.uint8)
    edit_param = [0.1, 0.0, 0, 0, 0, 15.0, 1.2, 1.2, 1]
    out = sg.edit(img, "a photo of a cat", "cat", edit_param, steps=4,
                  g_weight=5.0)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()


@pytest.mark.slow
def test_self_guidance_edit_batch_matches_single():
    """edit_batch == per-case edit: one jit(vmap) program over cases, with
    each case's silhouette transform riding as traced values."""
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    sg = SelfGuidance(pipe)
    h = w = pipe.config.height
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            for _ in range(2)]
    prompts = ["a photo of a cat", "a photo of a dog"]
    objs = ["cat", "dog"]
    edit_params = [
        [0.1, 0.0, 0, 0, 0, 15.0, 1.2, 1.2, 1],
        [-0.05, 0.1, 0, 0, 0, -30.0, 0.8, 1.0, 1],
    ]
    outs = sg.edit_batch(imgs, prompts, objs, edit_params, steps=4,
                         g_weight=5.0, seed=[11, 12])
    assert len(outs) == 2
    for img, prompt, obj, ep, s, out_b in zip(
        imgs, prompts, objs, edit_params, [11, 12], outs
    ):
        single = sg.edit(img, prompt, obj, ep, steps=4, g_weight=5.0,
                         seed=s)
        np.testing.assert_allclose(
            out_b.astype(np.int16), single.astype(np.int16), atol=1
        )
