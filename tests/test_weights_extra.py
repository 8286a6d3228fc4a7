"""Roundtrip tests for the OpenCLIP / BLIP weight converters."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu import weights as W


def _flatten(tree):
    return jax.tree_util.tree_flatten_with_path(tree)[0]


def test_open_clip_text_roundtrip():
    from freefine_tpu.models.open_clip_text import OpenCLIPText, OpenCLIPTextConfig

    cfg = OpenCLIPTextConfig(vocab_size=64, width=16, heads=2, layers=2,
                             projection_dim=8)
    model = OpenCLIPText(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 77), jnp.int32))

    # synthesize the open_clip state dict from the flax tree
    tensors = {}
    for path, leaf in _flatten(params["params"]):
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods
                if (p.key if hasattr(p, "key") else str(p)) != "LayerNorm_0"]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(W._module_to_diffusers(s) for s in segs)
        t = np.asarray(leaf, np.float32)
        if leaf_str == "positional_embedding":
            tensors["text.positional_embedding"] = t
        elif leaf_str == "text_projection":
            tensors["text.text_projection"] = t
        elif key.startswith("token_embedding"):
            tensors["text.token_embedding.weight"] = t
        elif key.startswith("ln_final"):
            tensors[f"text.ln_final.{W._LEAF_MAP[leaf_str]}"] = t
        else:
            k2 = key.replace("resblocks.", "text.transformer.resblocks.")
            # real open_clip state dicts keep the underscore in ln_1/ln_2
            k2 = k2.replace(".ln.1", ".ln_1").replace(".ln.2", ".ln_2")
            k2 = k2.replace(".in_proj", ".attn.in_proj")
            k2 = k2.replace(".out_proj", ".attn.out_proj")
            k2 = k2.replace(".mlp_fc", ".mlp.c_fc")
            k2 = k2.replace(".mlp_proj", ".mlp.c_proj")
            if k2.endswith("attn.in_proj"):
                sfx = "_weight" if leaf_str == "kernel" else "_bias"
                tensors[k2 + sfx] = t.T if leaf_str == "kernel" else t
            else:
                if leaf_str == "kernel":
                    t = t.T
                tensors[f"{k2}.{W._LEAF_MAP[leaf_str]}"] = t

    back = W.convert_open_clip_text(params, tensors)
    for (pa, a), (pb, b) in zip(_flatten(params), _flatten(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))


def test_blip_image_reward_roundtrip():
    from freefine_tpu.models.blip import BlipConfig, HashWordTokenizer, ImageReward

    cfg = BlipConfig(
        image_size=32, patch_size=16, vision_width=16, vision_layers=2,
        vision_heads=2, text_width=16, text_layers=2, text_heads=2,
        text_intermediate=32, vocab_size=100, max_text_len=8,
    )
    model = ImageReward(cfg)
    tok = HashWordTokenizer(vocab_size=100, max_len=8)
    ids, mask = tok.encode("x")
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
        jnp.asarray(ids)[None], jnp.asarray(mask)[None],
    )

    mlp_map = {"mlp.0": "0", "mlp.1": "2", "mlp.2": "4", "mlp.3": "6",
               "mlp.4": "8"}
    tensors = {}
    for path, leaf in _flatten(params["params"]):
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods
                if (p.key if hasattr(p, "key") else str(p)) != "LayerNorm_0"]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(W._module_to_diffusers(s) for s in segs)
        t = np.asarray(leaf, np.float32)
        if key.startswith("visual_encoder"):
            if leaf_str in ("cls_token", "pos_embed"):
                tensors[f"blip.visual_encoder.{leaf_str}"] = t
                continue
            k2 = key.replace("visual_encoder.", "blip.visual_encoder.")
            k2 = k2.replace("patch_embed", "patch_embed.proj")
            if ".blocks." in k2 and (".qkv" in k2 or k2.endswith(".proj")):
                k2 = k2.replace(".qkv", ".attn.qkv").replace(".proj", ".attn.proj")
            k2 = k2.replace(".mlp_fc1", ".mlp.fc1").replace(".mlp_fc2", ".mlp.fc2")
        elif key.startswith("text_encoder"):
            k2 = key.replace("text_encoder.layer.", "text_encoder.encoder.layer.")
            k2 = k2.replace("text_encoder.", "blip.text_encoder.")
            k2 = k2.replace("word_embeddings", "embeddings.word_embeddings")
            k2 = k2.replace("position_embeddings", "embeddings.position_embeddings")
            k2 = k2.replace(".emb_ln", ".embeddings.LayerNorm")
            k2 = k2.replace(".self_query", ".attention.self.query")
            k2 = k2.replace(".self_key", ".attention.self.key")
            k2 = k2.replace(".self_value", ".attention.self.value")
            k2 = k2.replace(".self_output", ".attention.output.dense")
            k2 = k2.replace(".self_ln", ".attention.output.LayerNorm")
            k2 = k2.replace(".cross_query", ".crossattention.self.query")
            k2 = k2.replace(".cross_key", ".crossattention.self.key")
            k2 = k2.replace(".cross_value", ".crossattention.self.value")
            k2 = k2.replace(".cross_output", ".crossattention.output.dense")
            k2 = k2.replace(".cross_ln", ".crossattention.output.LayerNorm")
            k2 = k2.replace(".intermediate", ".intermediate.dense")
            k2 = k2.replace(".output_ln", ".output.LayerNorm")
            if k2.endswith(".output"):
                k2 = k2[: -len(".output")] + ".output.dense"
        else:
            k2 = f"mlp.layers.{mlp_map[key]}"
        if leaf_str == "kernel":
            if t.ndim == 4:
                t = t.transpose(3, 2, 0, 1)
            elif t.ndim == 2:
                t = t.T
        tensors[f"{k2}.{W._LEAF_MAP[leaf_str]}"] = t

    back = W.convert_blip_image_reward(params, tensors)
    for (pa, a), (pb, b) in zip(_flatten(params), _flatten(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))


def test_dinov2_converter_roundtrip():
    from freefine_tpu.models.dinov2 import DINOv2, DINOv2Config

    cfg = DINOv2Config(dim=16, depth=2, heads=2, pos_embed_size=3)
    model = DINOv2(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))

    tensors = {}
    for path, leaf in _flatten(params["params"]):
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods
                if (p.key if hasattr(p, "key") else str(p)) != "LayerNorm_0"]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(W._module_to_diffusers(s) for s in segs)
        t = np.asarray(leaf, np.float32)
        if leaf_str in ("cls_token", "pos_embed"):
            tensors[leaf_str] = t
            continue
        if leaf_str == "gamma":
            tensors[f"{key}.gamma"] = t
            continue
        k2 = key.replace("patch_embed", "patch_embed.proj")
        k2 = k2.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
        if leaf_str == "kernel":
            if t.ndim == 4:
                t = t.transpose(3, 2, 0, 1)
            elif t.ndim == 2:
                t = t.T
        tensors[f"{k2}.{W._LEAF_MAP[leaf_str]}"] = t

    back = W.convert_dinov2(params, tensors)
    for (pa, a), (pb, b) in zip(_flatten(params), _flatten(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))

    # DINOv1 compat: gamma tensors absent -> filled with ones
    no_gamma = {k: v for k, v in tensors.items() if not k.endswith(".gamma")}
    back2 = W.convert_dinov2(params, no_gamma)
    for path, leaf in _flatten(back2):
        leaf_name = path[-1]
        n = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        if n == "gamma":
            np.testing.assert_array_equal(np.asarray(leaf), 1.0)


def test_ldm_single_file_conversion(tmp_path):
    """Round-trip the single-file LDM layout: diffusers-style tensors from
    the tiny pipeline -> renamed into LDM keys -> loaded via
    load_sd15_single_file -> identical params."""
    from freefine_tpu.config import tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine
    from tests.test_weights import _to_torch_layout

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    unet_d = _to_torch_layout(pipe.params["unet"], W._UNET_REWRITES)
    vae_d = _to_torch_layout(pipe.params["vae"], (
        (r"\.mid\.resnets", ".mid_block.resnets"),
        (r"\.mid\.attentions", ".mid_block.attentions"),
        (r"^encoder\.quant_conv$", "quant_conv"),
        (r"^decoder\.post_quant_conv$", "post_quant_conv"),
        (r"attentions\.0\.norm$", "attentions.0.group_norm"),
    ))
    text_d = _to_torch_layout(pipe.params["text"], W._TEXT_REWRITES)

    sd = {}
    # ---- UNet diffusers -> LDM ----
    res_ren = {"norm1": "in_layers.0", "conv1": "in_layers.2",
               "time_emb_proj": "emb_layers.1", "norm2": "out_layers.0",
               "conv2": "out_layers.3", "conv_shortcut": "skip_connection"}
    for k, v in unet_d.items():
        parts = k.split(".")
        if k.startswith("conv_in."):
            sd[f"model.diffusion_model.input_blocks.0.0.{parts[-1]}"] = v
        elif k.startswith("time_embedding.linear_1"):
            sd[f"model.diffusion_model.time_embed.0.{parts[-1]}"] = v
        elif k.startswith("time_embedding.linear_2"):
            sd[f"model.diffusion_model.time_embed.2.{parts[-1]}"] = v
        elif k.startswith("conv_norm_out"):
            sd[f"model.diffusion_model.out.0.{parts[-1]}"] = v
        elif k.startswith("conv_out"):
            sd[f"model.diffusion_model.out.2.{parts[-1]}"] = v
        elif k.startswith("down_blocks."):
            lvl, kind, j = int(parts[1]), parts[2], int(parts[3])
            if kind == "resnets":
                i = 1 + lvl * 3 + j
                sub = res_ren[parts[4]]
                sd[f"model.diffusion_model.input_blocks.{i}.0.{sub}.{parts[-1]}"] = v
            elif kind == "attentions":
                i = 1 + lvl * 3 + j
                rest = ".".join(parts[4:])
                sd[f"model.diffusion_model.input_blocks.{i}.1.{rest}"] = v
            else:  # downsamplers
                i = 1 + lvl * 3 + 2
                sd[f"model.diffusion_model.input_blocks.{i}.0.op.{parts[-1]}"] = v
        elif k.startswith("mid_block.resnets.0"):
            sd[f"model.diffusion_model.middle_block.0.{res_ren[parts[3]]}.{parts[-1]}"] = v
        elif k.startswith("mid_block.resnets.1"):
            sd[f"model.diffusion_model.middle_block.2.{res_ren[parts[3]]}.{parts[-1]}"] = v
        elif k.startswith("mid_block.attentions.0"):
            rest = ".".join(parts[3:])
            sd[f"model.diffusion_model.middle_block.1.{rest}"] = v
        elif k.startswith("up_blocks."):
            lvl, kind, j = int(parts[1]), parts[2], int(parts[3])
            if kind == "resnets":
                i = lvl * 3 + j
                sub = res_ren[parts[4]]
                sd[f"model.diffusion_model.output_blocks.{i}.0.{sub}.{parts[-1]}"] = v
            elif kind == "attentions":
                i = lvl * 3 + j
                rest = ".".join(parts[4:])
                sd[f"model.diffusion_model.output_blocks.{i}.1.{rest}"] = v
            else:  # upsamplers: on block i = lvl*3 + 2; module 2 if attn present
                i = lvl * 3 + 2
                has_attn = any(
                    kk.startswith(f"up_blocks.{lvl}.attentions.") for kk in unet_d
                )
                mod = 2 if has_attn else 1
                sd[f"model.diffusion_model.output_blocks.{i}.{mod}.conv.{parts[-1]}"] = v
        else:
            raise KeyError(k)
    # ---- VAE diffusers -> LDM ----
    vres = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
            "conv2": "conv2", "conv_shortcut": "nin_shortcut"}
    vattn = {"group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v",
             "to_out.0": "proj_out"}
    for k, v in vae_d.items():
        parts = k.split(".")
        if k.startswith("encoder.down_blocks."):
            lvl, kind = parts[2], parts[3]
            if kind == "resnets":
                sd[f"first_stage_model.encoder.down.{lvl}.block.{parts[4]}."
                   f"{vres[parts[5]]}.{parts[-1]}"] = v
            else:
                sd[f"first_stage_model.encoder.down.{lvl}.downsample.conv.{parts[-1]}"] = v
        elif k.startswith("decoder.up_blocks."):
            lvl, kind = 3 - int(parts[2]), parts[3]
            if kind == "resnets":
                sd[f"first_stage_model.decoder.up.{lvl}.block.{parts[4]}."
                   f"{vres[parts[5]]}.{parts[-1]}"] = v
            else:
                sd[f"first_stage_model.decoder.up.{lvl}.upsample.conv.{parts[-1]}"] = v
        elif ".mid_block.resnets." in k:
            side = parts[0]
            n = "block_1" if parts[3] == "0" else "block_2"
            sd[f"first_stage_model.{side}.mid.{n}.{vres[parts[4]]}.{parts[-1]}"] = v
        elif ".mid_block.attentions." in k:
            side = parts[0]
            name = ".".join(parts[4:-1])
            sd[f"first_stage_model.{side}.mid.attn_1.{vattn[name]}.{parts[-1]}"] = v
        elif k.startswith(("encoder.conv_norm_out", "decoder.conv_norm_out")):
            sd[f"first_stage_model.{k.replace('conv_norm_out', 'norm_out')}"] = v
        elif k.startswith(("encoder.conv_in", "encoder.conv_out",
                           "decoder.conv_in", "decoder.conv_out",
                           "quant_conv", "post_quant_conv")):
            sd[f"first_stage_model.{k}"] = v
        else:
            raise KeyError(k)
    # ---- text ----
    for k, v in text_d.items():
        sd[f"cond_stage_model.transformer.{k}"] = v

    # run the load path's internals directly on the in-memory dict
    unet_t = W._ldm_unet_to_diffusers(sd)
    vae_t = W._ldm_vae_to_diffusers(sd)
    text_t = {k[len(W._LDM_TEXT_PREFIX):]: np.asarray(v)
              for k, v in sd.items() if k.startswith(W._LDM_TEXT_PREFIX)}
    params = {
        "unet": W.convert_unet(pipe.params["unet"], unet_t),
        "vae": W.convert_vae(pipe.params["vae"], vae_t),
        "text": W.convert_text_encoder(pipe.params["text"], text_t),
    }
    for name in ("unet", "vae", "text"):
        for (pa, a), (pb, b) in zip(
            _flatten(pipe.params[name]), _flatten(params[name])
        ):
            assert pa == pb
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)
            )


def test_cast_params_for_inference():
    """bf16 serving cast: >=2-D f32 kernels cast, 1-D (norm scale/bias)
    and non-f32 leaves untouched."""
    import jax.numpy as jnp

    tree = {
        "kernel": np.ones((4, 4), np.float32),
        "bias": np.ones((4,), np.float32),
        "scale": np.ones((4,), np.float32),
        "table": np.ones((2, 3, 4), np.float32),
        "ids": np.ones((4, 4), np.int32),
    }
    out = W.cast_params_for_inference(jax.tree_util.tree_map(jnp.asarray, tree))
    assert out["kernel"].dtype == jnp.bfloat16
    assert out["table"].dtype == jnp.bfloat16
    assert out["bias"].dtype == jnp.float32
    assert out["scale"].dtype == jnp.float32
    assert out["ids"].dtype == jnp.int32
