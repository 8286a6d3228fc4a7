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
