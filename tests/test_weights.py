"""Weight-conversion tests: key mapping + transform roundtrip.

Real SD-1.5 checkpoints are not available offline, so these tests validate
(a) that the derived diffusers key set matches the canonical SD-1.5 naming
scheme, and (b) that a synthetic checkpoint written in torch layout
round-trips through the converter bit-exactly.
"""

import re

import jax
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.pipeline import FreeFine
from freefine_tpu import weights as W


@pytest.fixture(scope="module")
def pipe():
    return FreeFine(config=tiny_pipeline_config(), init_random=True)


def _keys_for(tree, rewrites):
    flat = jax.tree_util.tree_flatten_with_path(tree["params"])[0]
    keys = set()
    for path, leaf in flat:
        *mods, leaf_name = path
        key = W._flax_path_to_key(mods)
        for pat, rep in rewrites:
            key = re.sub(pat, rep, key)
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        keys.add(f"{key}.{W._LEAF_MAP[leaf_str]}")
    return keys


def test_unet_keys_match_diffusers_naming(pipe):
    keys = _keys_for(pipe.params["unet"], W._UNET_REWRITES)
    expected = [
        "conv_in.weight",
        "conv_in.bias",
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.bias",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_out.0.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.resnets.0.conv1.weight",
        "mid_block.attentions.0.transformer_blocks.0.norm1.weight",
        "up_blocks.1.attentions.0.transformer_blocks.0.attn1.to_k.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "up_blocks.3.resnets.2.conv_shortcut.weight",
        "conv_norm_out.weight",
        "conv_out.weight",
    ]
    for k in expected:
        assert k in keys, f"missing {k}"


def test_vae_keys_match_diffusers_naming(pipe):
    keys = _keys_for(
        pipe.params["vae"],
        (
            (r"\.mid\.resnets", ".mid_block.resnets"),
            (r"\.mid\.attentions", ".mid_block.attentions"),
            (r"^encoder\.quant_conv$", "quant_conv"),
            (r"^decoder\.post_quant_conv$", "post_quant_conv"),
            (r"attentions\.0\.norm$", "attentions.0.group_norm"),
        ),
    )
    expected = [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.resnets.0.conv1.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.to_out.0.weight",
        "encoder.conv_norm_out.weight",
        "encoder.conv_out.weight",
        "quant_conv.weight",
        "post_quant_conv.weight",
        "decoder.conv_in.weight",
        "decoder.up_blocks.0.resnets.0.conv1.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "decoder.conv_out.bias",
    ]
    for k in expected:
        assert k in keys, f"missing {k}"


def test_text_keys_match_transformers_naming(pipe):
    keys = _keys_for(pipe.params["text"], W._TEXT_REWRITES)
    expected = [
        "text_model.embeddings.token_embedding.weight",
        "text_model.embeddings.position_embedding.weight",
        "text_model.encoder.layers.0.self_attn.q_proj.weight",
        "text_model.encoder.layers.0.self_attn.out_proj.bias",
        "text_model.encoder.layers.1.layer_norm1.weight",
        "text_model.encoder.layers.0.mlp.fc1.weight",
        "text_model.final_layer_norm.weight",
    ]
    for k in expected:
        assert k in keys, f"missing {k}"


def _to_torch_layout(tree, rewrites):
    """Inverse transform: flax tree -> torch-layout tensor dict."""
    flat = jax.tree_util.tree_flatten_with_path(tree["params"])[0]
    out = {}
    for path, leaf in flat:
        *mods, leaf_name = path
        key = W._flax_path_to_key(mods)
        for pat, rep in rewrites:
            key = re.sub(pat, rep, key)
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        t = np.asarray(leaf, np.float32)
        if leaf_str == "kernel":
            if t.ndim == 4:
                t = t.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            elif t.ndim == 2:
                t = t.T
        out[f"{key}.{W._LEAF_MAP[leaf_str]}"] = t
    return out


def test_roundtrip_unet(pipe):
    tensors = _to_torch_layout(pipe.params["unet"], W._UNET_REWRITES)
    back = W.convert_unet(pipe.params["unet"], tensors)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(pipe.params["unet"])[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))


def test_roundtrip_text(pipe):
    tensors = _to_torch_layout(pipe.params["text"], W._TEXT_REWRITES)
    back = W.convert_text_encoder(pipe.params["text"], tensors)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(pipe.params["text"])[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))
