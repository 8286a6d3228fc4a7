"""Structural tests for perception models (DINOv2, Depth-Anything,
EfficientSAM) on miniature configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.models.depth_anything import (
    DepthAnything,
    DepthAnythingConfig,
    preprocess_depth_input,
    resize_bilinear_align_corners,
)
from freefine_tpu.models.dinov2 import DINOv2, DINOv2Config
from freefine_tpu.models.efficient_sam import EfficientSAM, EfficientSAMConfig


@pytest.fixture(scope="module")
def tiny_dino():
    cfg = DINOv2Config(dim=32, depth=3, heads=2, pos_embed_size=4)
    model = DINOv2(cfg)
    x = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.key(0), x)
    return cfg, model, params


def test_dinov2_shapes(tiny_dino):
    cfg, model, params = tiny_dino
    x = jnp.ones((2, 28, 28, 3))
    patch, cls = model.apply(params, x)
    assert patch.shape == (2, 4, 32) and cls.shape == (2, 32)


def test_dinov2_intermediate_layers(tiny_dino):
    cfg, model, params = tiny_dino
    x = jnp.ones((1, 42, 28, 3))  # non-square, pos-embed interpolation
    feats = model.apply(params, x, num_intermediate=3)
    assert len(feats) == 3
    for patch, cls in feats:
        assert patch.shape == (1, 6, 32) and cls.shape == (1, 32)
    # layers must differ (distinct blocks)
    assert not np.allclose(np.asarray(feats[0][0]), np.asarray(feats[2][0]))


def test_align_corners_resize_matches_linspace():
    x = jnp.arange(5.0).reshape(1, 5, 1, 1)
    out = resize_bilinear_align_corners(x, (9, 1))
    np.testing.assert_allclose(
        np.asarray(out).ravel(), np.linspace(0, 4, 9), atol=1e-6
    )


def test_depth_anything_tiny():
    cfg = DepthAnythingConfig(
        backbone=DINOv2Config(dim=32, depth=4, heads=2, pos_embed_size=4),
        features=16,
        out_channels=(8, 16, 16, 32),
    )
    model = DepthAnything(cfg)
    x = jnp.ones((1, 56, 56, 3))
    params = model.init(jax.random.key(0), x)
    depth = model.apply(params, x)
    assert depth.shape == (1, 56, 56)
    d = np.asarray(depth)
    assert (d >= 0).all() and np.isfinite(d).all()


def test_depth_preprocess_multiple_of_14():
    img = jnp.zeros((100, 160, 3), jnp.uint8)
    out = preprocess_depth_input(img, size=56)
    assert out.shape[1] % 14 == 0 and out.shape[2] % 14 == 0
    assert out.shape[0] == 1


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = EfficientSAMConfig(
        img_size=64, patch_size=16, patch_embed_dim=32, depth=2, num_heads=2,
        neck_dim=32, decoder_mlp_dim=64, decoder_heads=2,
        upscaling_dims=(16, 8), iou_hidden_dim=16,
    )
    model = EfficientSAM(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    pts = jnp.zeros((1, 1, 2, 2))
    lbl = jnp.ones((1, 1, 2))
    params = model.init(jax.random.key(0), img, pts, lbl)
    return cfg, model, params


def test_efficient_sam_shapes(tiny_sam):
    cfg, model, params = tiny_sam
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    pts = jnp.asarray([[[[10.0, 12.0], [40.0, 44.0]]]])
    lbl = jnp.asarray([[[2.0, 3.0]]])
    masks, iou = model.apply(params, img, pts, lbl)
    g = cfg.img_size // cfg.patch_size
    up = g * (2 ** len(cfg.upscaling_dims))
    assert masks.shape == (1, 1, cfg.num_multimask_outputs, up, up)
    assert iou.shape == (1, 1, cfg.num_multimask_outputs)
    # IoU sorted descending
    i = np.asarray(iou[0, 0])
    assert (np.diff(i) <= 1e-6).all()


def test_efficient_sam_point_padding(tiny_sam):
    """Fewer prompt points than decoder_max get padded with label -1 and
    must not change with extra identical queries."""
    cfg, model, params = tiny_sam
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    pts = jnp.asarray([[[[10.0, 12.0]]]])
    lbl = jnp.asarray([[[1.0]]])
    masks1, _ = model.apply(params, img, pts, lbl)
    pts2 = jnp.tile(pts, (1, 2, 1, 1))
    lbl2 = jnp.tile(lbl, (1, 2, 1))
    masks2, _ = model.apply(params, img, pts2, lbl2)
    np.testing.assert_allclose(
        np.asarray(masks1[0, 0]), np.asarray(masks2[0, 1]), atol=1e-5
    )
