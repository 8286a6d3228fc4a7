"""DiffusionHandles baseline core tests: correspondence processing, loss
properties, null-text inversion, and the e2e tiny edit (with and without
depth conditioning)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.baselines.diffusion_handles import (
    DiffusionHandles,
    background_loss,
    foreground_loss,
    null_text_invert,
    process_correspondences,
)
from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.pipeline import FreeFine


def test_process_correspondences_translation():
    img_res, grid = 64, 8
    corr = np.full((img_res, img_res, 2), np.nan)
    # object block at rows/cols 16..23 moves +16 px right
    for y in range(16, 24):
        for x in range(16, 24):
            corr[y, x] = [y, x + 16]
    out = process_correspondences(corr, img_res, grid=grid)
    v = out["fg_valid"] > 0
    assert v.sum() == 1  # one coarse cell pair after dedupe
    o = out["fg_orig"][v][0]
    t = out["fg_trans"][v][0]
    np.testing.assert_array_equal(o, [2, 2])
    np.testing.assert_array_equal(t, [2, 4])
    assert out["bg_orig"][2, 2] == 0 and out["bg_trans"][2, 4] == 0
    assert out["bg_orig"][0, 0] == 1


def test_foreground_loss_zero_when_matched():
    g, c = 8, 4
    act = jnp.asarray(np.random.default_rng(0).normal(size=(g, g, c)),
                      jnp.float32)
    # shifted copy: act_new[y, x+2] = act_orig[y, x]
    act_new = jnp.roll(act, 2, axis=1)
    fg_o = np.full((16, 2), g, np.int32)
    fg_t = np.full((16, 2), g, np.int32)
    valid = np.zeros((16,), np.float32)
    n = 0
    for y in range(2, 5):
        for x in range(2, 4):
            fg_o[n] = [y, x]
            fg_t[n] = [y, x + 2]
            valid[n] = 1
            n += 1
    loss = foreground_loss(act_new, act, jnp.asarray(fg_o),
                           jnp.asarray(fg_t), jnp.asarray(valid))
    assert float(loss) < 1e-6
    # unmatched activations are penalised
    loss2 = foreground_loss(act, act, jnp.asarray(fg_o),
                            jnp.asarray(fg_t), jnp.asarray(valid))
    assert float(loss2) > 1e-3


def test_background_loss_zero_for_identical():
    g, c = 8, 4
    act = jnp.asarray(np.random.default_rng(1).normal(size=(g, g, c)),
                      jnp.float32)
    bg = jnp.ones((g, g), jnp.float32)
    assert float(background_loss(act, act, bg, bg)) < 1e-6


@pytest.mark.slow
def test_null_text_inversion_improves_reconstruction():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    lat = jnp.asarray(
        np.random.default_rng(2).normal(
            size=(1, pipe.config.latent_height, pipe.config.latent_width, 4)
        ) * 0.2, jnp.float32,
    )
    ctx = pipe.encode_text(["a cat"])
    us, traj = null_text_invert(pipe, lat, ctx, steps=3, iters=4)
    assert us.shape[0] == 3
    assert traj.shape[0] == 4
    assert np.isfinite(np.asarray(us)).all()


@pytest.mark.slow
def test_diffusion_handles_end_to_end_tiny():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    dh = DiffusionHandles(pipe)
    h = w = pipe.config.height
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    depth = rng.uniform(2.0, 6.0, (h, w)).astype(np.float32)
    mask = np.zeros((h, w), np.uint8)
    mask[16:32, 16:32] = 255
    out = dh.edit(img, depth, mask, [10, 0, 0, 0, 0, 0, 1, 1, 1],
                  prompt="a photo", steps=3, num_optsteps=1, nti_iters=2)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()


@pytest.mark.slow
def test_diffusion_handles_depth_conditioned_tiny():
    cfg = tiny_pipeline_config()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, in_channels=5)
    )
    pipe = FreeFine(config=cfg, init_random=True)
    dh = DiffusionHandles(pipe)
    assert dh.use_depth
    h = w = cfg.height
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    depth = rng.uniform(2.0, 6.0, (h, w)).astype(np.float32)
    mask = np.zeros((h, w), np.uint8)
    mask[16:32, 16:32] = 255
    out = dh.edit(img, depth, mask, [10, 0, 0, 0, 0, 0, 1, 1, 1],
                  prompt="a photo", steps=3, num_optsteps=1, nti_iters=2)
    assert out.shape == (h, w, 3)
    assert np.isfinite(out.astype(np.float64)).all()
