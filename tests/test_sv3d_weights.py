"""sgm SV3D weight-converter roundtrip: synthesize an sgm-style state dict
from a tiny flax VideoUNet and convert back bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu import weights_sv3d as WS
from freefine_tpu.models.video_unet import VideoUNet, VideoUNetConfig


def _leafname(p):
    return p.key if hasattr(p, "key") else str(p)


def _inverse_sgm_dict(params, channel_mult, num_res):
    """flax VideoUNet params -> sgm-style tensors (the converter's inverse)."""
    pos = WS._block_positions(channel_mult, num_res)
    sd = {}

    def put_leaves(base, sub, temporal=False):
        for leaf, arr in sub.items():
            t = np.asarray(arr, np.float32)
            if leaf == "kernel":
                if temporal and t.ndim == 4:   # [3,1,I,O] -> [O,I,3,1,1]
                    t = t.transpose(3, 2, 0, 1)[..., None]
                elif t.ndim == 4:
                    t = t.transpose(3, 2, 0, 1)
                elif t.ndim == 2:
                    t = t.T
            sd[f"{base}.{WS._LEAF[leaf]}"] = t

    def put_norm(base, wrapper):
        inner = next(iter(wrapper.values()))
        if not isinstance(inner, dict):  # flat GroupNorm32 scale/bias
            put_leaves(base, wrapper)
        else:
            put_leaves(base, inner)

    def put_res(base, sub):
        for name, inner in sub.items():
            if name == "time_mixer":
                sd[f"{base}.time_mixer.mix_factor"] = np.asarray(
                    inner["mix_factor"], np.float32
                )
            elif name == "time_stack":
                for n2, i2 in inner.items():
                    if n2 in ("norm1", "norm2"):
                        put_norm(f"{base}.time_stack.{WS._RES[n2]}", i2)
                    else:
                        put_leaves(f"{base}.time_stack.{WS._RES[n2]}", i2,
                                   temporal=(n2 in ("conv1", "conv2")))
            elif name in ("norm1", "norm2"):
                put_norm(f"{base}.{WS._RES[name]}", inner)
            else:
                put_leaves(f"{base}.{WS._RES[name]}", inner)

    def put_ff(base, sub):
        put_leaves(f"{base}.net.0.proj", sub["net_0"]["proj"])
        put_leaves(f"{base}.net.2", sub["net_2"])

    def put_attn(base, sub):
        tb = f"{base}.transformer_blocks.0"
        for name, inner in sub.items():
            if name == "norm":
                put_norm(f"{base}.norm", inner)
            elif name in ("proj_in", "proj_out"):
                put_leaves(f"{base}.{name}", inner)
            elif name == "time_mixer":
                sd[f"{base}.time_mixer.mix_factor"] = np.asarray(
                    inner["mix_factor"], np.float32
                )
            elif name == "ff":
                put_ff(f"{tb}.ff", inner)
            elif name in ("norm1", "norm2", "norm3"):
                put_norm(f"{tb}.{name}", inner)
            elif name.startswith("attn"):
                put_leaves(f"{tb}.{WS._ATTN[name]}", inner)
            elif name == "time_stack":
                ts = f"{base}.time_stack.0"
                for n2, i2 in inner.items():
                    if n2 in ("norm_in", "norm1", "norm2", "norm3"):
                        put_norm(f"{ts}.{n2}", i2)
                    elif n2 == "ff_in":
                        put_ff(f"{ts}.ff_in", i2)
                    elif n2 == "ff":
                        put_ff(f"{ts}.ff", i2)
                    elif n2 == "time_pos_embed_0":
                        put_leaves(f"{base}.time_pos_embed.0", i2)
                    elif n2 == "time_pos_embed_2":
                        put_leaves(f"{base}.time_pos_embed.2", i2)
                    else:
                        put_leaves(f"{ts}.{WS._TIME_ATTN[n2]}", i2)

    for name, sub in params["params"].items():
        if name == "conv_in":
            put_leaves(f"{WS._P}input_blocks.0.0", sub)
        elif name == "time_embed":
            put_leaves(f"{WS._P}time_embed.0", sub["linear_1"])
            put_leaves(f"{WS._P}time_embed.2", sub["linear_2"])
        elif name == "label_emb_0":
            put_leaves(f"{WS._P}label_emb.0.0", sub)
        elif name == "label_emb_2":
            put_leaves(f"{WS._P}label_emb.0.2", sub)
        elif name == "out_norm":
            put_norm(f"{WS._P}out.0", sub)
        elif name == "out_conv":
            put_leaves(f"{WS._P}out.2", sub)
        elif name.endswith("_ds"):
            kind, idx, slot = pos[name]
            put_leaves(f"{WS._sgm_prefix(kind, idx, slot)}.op", sub)
        elif name.endswith("_us"):
            kind, idx, _ = pos[name]
            lvl_has_attn = any(
                k.startswith(f"{WS._P}{kind}.{idx}.1.proj_in") for k in sd
            )
            slot = 2 if lvl_has_attn else 1
            put_leaves(f"{WS._P}{kind}.{idx}.{slot}.conv", sub)
        elif "_res_" in name or name.startswith("mid_res"):
            kind, idx, slot = pos[name]
            put_res(WS._sgm_prefix(kind, idx, slot), sub)
        elif "_attn" in name:
            kind, idx, slot = pos[name]
            put_attn(WS._sgm_prefix(kind, idx, slot), sub)
    return sd


@pytest.mark.slow
def test_sv3d_converter_roundtrip():
    cfg = VideoUNetConfig(
        model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(True, False), num_head_channels=8,
        context_dim=16, adm_in_channels=24, num_frames=2,
        norm_num_groups=4, dtype=jnp.float32,
    )
    model = VideoUNet(cfg)
    t = cfg.num_frames
    params = model.init(
        jax.random.key(0),
        jnp.zeros((t, 8, 8, 8)), jnp.zeros((t,)),
        jnp.zeros((t, 1, 16)), jnp.zeros((t, 24)),
    )
    sd = _inverse_sgm_dict(params, cfg.channel_mult, cfg.num_res_blocks)
    # sanity: sgm-style names present
    assert f"{WS._P}input_blocks.1.0.in_layers.0.weight" in sd
    assert f"{WS._P}input_blocks.1.1.time_stack.0.ff_in.net.0.proj.weight" in sd
    assert f"{WS._P}middle_block.1.time_pos_embed.0.weight" in sd

    back = WS.convert_sv3d_unet(
        params, sd, channel_mult=cfg.channel_mult, num_res=cfg.num_res_blocks
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_convert_sv3d_clip_image_prefix(rng_np):
    """convert_sv3d_clip_image consumes the conditioner-prefixed open_clip
    visual layout (the math/naming itself is torch-parity-tested in
    test_hf_parity.py::test_open_clip_vision_parity_vs_transformers)."""
    import jax
    import jax.numpy as jnp

    from freefine_tpu.models.clip_image import CLIPImageEncoder, CLIPVisionConfig
    from freefine_tpu.weights_sv3d import convert_sv3d_clip_image

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=16, intermediate_size=32,
        num_layers=1, num_heads=2, projection_dim=8, activation="gelu",
        dtype=jnp.float32,
    )
    model = CLIPImageEncoder(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))

    pre = "conditioner.embedders.0.open_clip.model.visual."
    sd = {
        f"{pre}class_embedding": rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}positional_embedding": rng_np.standard_normal((5, 16)).astype(np.float32),
        f"{pre}conv1.weight": rng_np.standard_normal((16, 3, 16, 16)).astype(np.float32),
        f"{pre}ln_pre.weight": rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}ln_pre.bias": rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}ln_post.weight": rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}ln_post.bias": rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}proj": rng_np.standard_normal((16, 8)).astype(np.float32),
        f"{pre}transformer.resblocks.0.attn.in_proj_weight":
            rng_np.standard_normal((48, 16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.attn.in_proj_bias":
            rng_np.standard_normal((48)).astype(np.float32),
        f"{pre}transformer.resblocks.0.attn.out_proj.weight":
            rng_np.standard_normal((16, 16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.attn.out_proj.bias":
            rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.ln_1.weight":
            rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.ln_1.bias":
            rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.ln_2.weight":
            rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.ln_2.bias":
            rng_np.standard_normal((16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.mlp.c_fc.weight":
            rng_np.standard_normal((32, 16)).astype(np.float32),
        f"{pre}transformer.resblocks.0.mlp.c_fc.bias":
            rng_np.standard_normal((32)).astype(np.float32),
        f"{pre}transformer.resblocks.0.mlp.c_proj.weight":
            rng_np.standard_normal((16, 32)).astype(np.float32),
        f"{pre}transformer.resblocks.0.mlp.c_proj.bias":
            rng_np.standard_normal((16)).astype(np.float32),
    }
    out = convert_sv3d_clip_image(params, sd)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["visual_projection"]), sd[f"{pre}proj"]
    )
    # fused in_proj row-split: q rows -> q_proj kernel (transposed)
    np.testing.assert_array_equal(
        np.asarray(
            out["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        ),
        sd[f"{pre}transformer.resblocks.0.attn.in_proj_weight"][:16].T,
    )
