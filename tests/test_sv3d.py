"""SV3D video-model tests: EDM math, guider, tiny video UNet, paste-back."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.models import sv3d as S
from freefine_tpu.models.video_unet import VideoUNet, VideoUNetConfig


def test_edm_sigmas_shape_and_range():
    s = np.asarray(S.edm_sigmas(10, sigma_max=700.0))
    assert s.shape == (11,)
    np.testing.assert_allclose(s[0], 700.0, rtol=1e-5)
    np.testing.assert_allclose(s[-2], 0.002, rtol=1e-4)
    assert s[-1] == 0.0
    assert (np.diff(s) < 0).all()


def test_v_scaling():
    c_skip, c_out, c_in, c_noise = S.v_scaling_edm_cnoise(jnp.float32(1.0))
    np.testing.assert_allclose(float(c_skip), 0.5)
    np.testing.assert_allclose(float(c_out), -1 / np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(float(c_in), 1 / np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(float(c_noise), 0.0, atol=1e-7)


def test_triangle_guider():
    g = np.asarray(S.triangle_guidance_scales(21, 2.5))
    assert g[0] == 1.0 and g[-1] == 1.0
    np.testing.assert_allclose(g[10], 2.5)
    assert (g >= 1.0).all() and (g <= 2.5).all()


def test_vector_cond_shape():
    y = S.build_sv3d_vector_cond(1e-5, jnp.zeros(21), jnp.linspace(0, 6.28, 21))
    assert y.shape == (21, 1280)
    assert np.isfinite(np.asarray(y)).all()


def test_pick_frame():
    az = [0, 90, 180, 270]
    assert S.pick_frame_for_angle(az, 85) == 1
    assert S.pick_frame_for_angle(az, 355) == 0
    assert S.pick_frame_for_angle(az, -90) == 3


@pytest.fixture(scope="module")
def tiny_video():
    cfg = VideoUNetConfig(
        model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(True, False), num_head_channels=8,
        context_dim=16, adm_in_channels=24, num_frames=3,
        norm_num_groups=4, dtype=jnp.float32,
    )
    model = VideoUNet(cfg)
    t = cfg.num_frames
    sample = jnp.zeros((t, 8, 8, 8))
    t_cont = jnp.zeros((t,))
    ctx = jnp.zeros((t, 1, 16))
    y = jnp.zeros((t, 24))
    params = model.init(jax.random.key(0), sample, t_cont, ctx, y)
    return cfg, model, params


def test_video_unet_forward(tiny_video):
    cfg, model, params = tiny_video
    t = cfg.num_frames
    out = model.apply(
        params,
        jnp.ones((t, 8, 8, 8)),
        jnp.full((t,), 0.5),
        jnp.ones((t, 1, 16)),
        jnp.ones((t, 24)),
    )
    assert out.shape == (t, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_video_unet_temporal_mixing_changes_frames(tiny_video):
    """With distinct frame contents, output frames must differ (temporal
    attention sees the frame axis)."""
    cfg, model, params = tiny_video
    t = cfg.num_frames
    sample = jnp.stack(
        [jnp.full((8, 8, 8), i / 2.0) for i in range(t)]
    )
    out = model.apply(
        params, sample, jnp.zeros((t,)), jnp.zeros((t, 1, 16)), jnp.zeros((t, 24))
    )
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_sv3d_sample_latents_tiny(tiny_video):
    cfg, model, params = tiny_video
    sv = S.SV3D(unet=model, unet_params=params, num_frames=cfg.num_frames,
                num_steps=3)
    lat = sv.sample_latents(
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1, 1, 16)),
        azimuths_deg=[0, 120, 240],
        elevations_deg=[10, 10, 10],
        rng=jax.random.key(0),
    )
    assert lat.shape == (cfg.num_frames, 8, 8, 4)
    assert np.isfinite(np.asarray(lat)).all()


def test_paste_novel_view_back(rng_np):
    img = rng_np.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[20:40, 10:30] = 255
    view = np.zeros((32, 32, 3), np.uint8)
    view[8:24, 8:24] = 200
    vmask = np.zeros((32, 32), np.uint8)
    vmask[8:24, 8:24] = 255
    out, tmask = S.paste_novel_view_back(img, mask, view, vmask)
    assert out.shape == img.shape
    ys, xs = np.nonzero(tmask > 0)
    assert ys.min() >= 20 and ys.max() < 40 and xs.min() >= 10 and xs.max() < 30
    assert (out[tmask > 0] == 200).all()


def test_crop_object_square(rng_np):
    img = rng_np.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[10:30, 40:60] = 255
    crop, bbox = S.crop_object_square(img, mask, out_size=32)
    assert crop.shape == (32, 32, 3)
    assert bbox == (40, 10, 60, 30)
