"""IP-Adapter tests: resampler shapes, converter roundtrip against a
synthetic torch-layout checkpoint, and the adapter-enabled UNet path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import EditConfig
from freefine_tpu.models.ip_adapter import (
    Resampler,
    ResamplerConfig,
    add_ip_adapter_params,
    convert_ip_adapter_unet,
    convert_resampler,
    cross_attention_order,
)
from freefine_tpu.pipeline import FreeFine


def tiny_resampler_cfg():
    return ResamplerConfig(dim=32, depth=2, dim_head=8, heads=4,
                           num_queries=4, embedding_dim=48, output_dim=24,
                           ff_mult=2)


def test_resampler_shapes():
    cfg = tiny_resampler_cfg()
    model = Resampler(config=cfg)
    x = jnp.zeros((2, 10, cfg.embedding_dim))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, cfg.num_queries, cfg.output_dim)


def test_resampler_converter_roundtrip():
    cfg = tiny_resampler_cfg()
    model = Resampler(config=cfg)
    x = jnp.zeros((1, 6, cfg.embedding_dim))
    params = model.init(jax.random.key(1), x)

    # build a synthetic torch-layout state dict from random values
    from flax import traverse_util

    from freefine_tpu.models.ip_adapter import _resampler_map

    rng = np.random.default_rng(0)
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    sd = {}
    for fpath, arr in flat.items():
        tkey = _resampler_map(cfg.depth)[fpath]
        t = rng.normal(size=np.asarray(arr).shape).astype(np.float32)
        if fpath.endswith("kernel"):
            t = t.T
        sd[tkey] = t
    out = convert_resampler(params, sd, depth=cfg.depth)
    got = traverse_util.flatten_dict(out["params"], sep="/")
    for fpath, arr in flat.items():
        t = sd[_resampler_map(cfg.depth)[fpath]]
        expect = t.T if fpath.endswith("kernel") else t
        np.testing.assert_allclose(np.asarray(got[fpath]), expect)


def test_cross_attention_order_tiny():
    cfg = tiny_pipeline_config().unet
    order = cross_attention_order(cfg)
    # every listed path is unique and down paths precede up precede mid
    assert len(order) == len(set(order))
    kinds = ["down" if "down" in p else "up" if "up" in p else "mid"
             for p in order]
    assert kinds == sorted(kinds, key=["down", "up", "mid"].index)


def test_ip_unet_path_and_converter():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    cfg = pipe.config
    unet_ip = add_ip_adapter_params(pipe)
    lh, lw = cfg.latent_height, cfg.latent_width
    lat = jnp.zeros((2, lh, lw, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, cfg.unet.cross_attention_dim), jnp.float32)
    tok = jnp.asarray(
        np.random.default_rng(2).normal(
            size=(2, 4, cfg.unet.cross_attention_dim)
        ), jnp.float32,
    )
    ecfg = EditConfig(mode="none", method=None, local_cfg=False, ip_scale=0.6)
    out = pipe.unet.apply(unet_ip, lat, jnp.int32(3), ctx,
                          edit_cfg=ecfg, context_image=tok)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()

    # image tokens actually influence the output
    out2 = pipe.unet.apply(unet_ip, lat, jnp.int32(3), ctx,
                           edit_cfg=ecfg, context_image=tok * 2.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    # converter fills every adapter kernel from a torch-layout dict
    from flax import traverse_util

    rng = np.random.default_rng(3)
    order = cross_attention_order(cfg.unet)
    flat = traverse_util.flatten_dict(unet_ip["params"], sep="/")
    sd = {}
    for idx, path in enumerate(order):
        for leaf in ("to_k_ip", "to_v_ip"):
            shape = np.asarray(flat[f"{path}/attn2/{leaf}/kernel"]).shape
            sd[f"{2 * idx + 1}.{leaf}.weight"] = rng.normal(
                size=(shape[1], shape[0])
            ).astype(np.float32)
    conv = convert_ip_adapter_unet(unet_ip, cfg.unet, sd)
    got = traverse_util.flatten_dict(conv["params"], sep="/")
    for idx, path in enumerate(order):
        np.testing.assert_allclose(
            np.asarray(got[f"{path}/attn2/to_k_ip/kernel"]),
            sd[f"{2 * idx + 1}.to_k_ip.weight"].T,
        )


def test_region_drag_with_ip_tokens():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    pipe.params = {**pipe.params, "unet": add_ip_adapter_params(pipe)}
    from freefine_tpu.baselines.region_drag import RegionDrag

    h = w = pipe.config.height
    img = np.random.default_rng(4).integers(0, 255, (h, w, 3), dtype=np.uint8)
    tok = jnp.asarray(
        np.random.default_rng(5).normal(
            size=(1, 4, pipe.config.unet.cross_attention_dim)
        ), jnp.float32,
    )
    rd = RegionDrag(pipe)
    out = rd.drag(img, np.array([[16, 16]]), np.array([[32, 32]]), "a cat",
                  steps=4, start_t=0.5, end_t=0.25,
                  image_tokens=tok, ip_scale=0.5)
    assert out.shape == (h, w, 3)
    assert np.isfinite(out.astype(np.float64)).all()
