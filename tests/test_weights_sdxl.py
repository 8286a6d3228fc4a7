"""SDXL weight-converter tests: key naming + synthetic-checkpoint roundtrip
(no SDXL checkpoint offline; mirrors tests/test_weights.py's strategy)."""

import re

import jax
import numpy as np
import pytest

from freefine_tpu import weights as W
from freefine_tpu.config import tiny_sdxl_pipeline_config
from freefine_tpu.sdxl import SDXLFreeFine


@pytest.fixture(scope="module")
def sdxl_pipe():
    return SDXLFreeFine(config=tiny_sdxl_pipeline_config(), init_random=True)


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


def test_sdxl_unet_keys_match_diffusers_naming(sdxl_pipe):
    keys = _keys_for(sdxl_pipe.params["unet"], W._SDXL_UNET_REWRITES)
    expected = [
        "add_embedding.linear_1.weight",
        "add_embedding.linear_2.bias",
        # depth-2 transformer block (SDXL has per-level depths)
        "down_blocks.1.attentions.0.transformer_blocks.1.attn1.to_q.weight",
        "up_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        "mid_block.attentions.0.transformer_blocks.1.ff.net.0.proj.weight",
        # use_linear projections are Dense (2D weights), same diffusers names
        "down_blocks.1.attentions.0.proj_in.weight",
        "down_blocks.1.attentions.0.proj_out.weight",
    ]
    for k in expected:
        assert k in keys, f"missing {k}"


def _hf_text2_layout(tree):
    """Inverse of convert_sdxl_text2: flax tree -> HF-format tensor dict."""
    flat = jax.tree_util.tree_flatten_with_path(tree["params"])[0]
    out = {}
    pre = "text_model."
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        segs = [s for s in segs if s != "LayerNorm_0"]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(W._module_to_diffusers(s) for s in segs)
        suffix = W._LEAF_MAP.get(leaf_str)
        t = np.asarray(leaf, np.float32)
        if leaf_str == "positional_embedding":
            out[f"{pre}embeddings.position_embedding.weight"] = t
        elif leaf_str == "text_projection":
            out["text_projection.weight"] = t.T
        elif key.startswith("token_embedding"):
            out[f"{pre}embeddings.token_embedding.weight"] = t
        elif key.startswith("ln_final"):
            out[f"{pre}final_layer_norm.{suffix}"] = t
        else:
            m = re.match(r"resblocks\.(\d+)\.(.+)", key)
            base = f"{pre}encoder.layers.{m.group(1)}"
            sub = m.group(2)
            if sub == "in_proj":
                if leaf_str == "kernel":
                    q, k, v = np.split(t, 3, axis=-1)
                    for name, part in zip("qkv", (q, k, v)):
                        out[f"{base}.self_attn.{name}_proj.weight"] = part.T
                else:
                    q, k, v = np.split(t, 3, axis=-1)
                    for name, part in zip("qkv", (q, k, v)):
                        out[f"{base}.self_attn.{name}_proj.bias"] = part
            else:
                hf_sub = {
                    "ln.1": "layer_norm1", "ln.2": "layer_norm2",
                    "out_proj": "self_attn.out_proj",
                    "mlp_fc": "mlp.fc1", "mlp_proj": "mlp.fc2",
                }[sub]
                if leaf_str == "kernel" and t.ndim == 2:
                    t = t.T
                out[f"{base}.{hf_sub}.{suffix}"] = t
    return out


def _assert_trees_equal(a, b):
    for (pa, x), (pb, y) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(b)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(x, np.float32), np.asarray(y))


def test_roundtrip_sdxl_unet(sdxl_pipe):
    def to_torch(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree["params"])[0]
        out = {}
        for path, leaf in flat:
            *mods, leaf_name = path
            key = W._flax_path_to_key(mods)
            for pat, rep in W._SDXL_UNET_REWRITES:
                key = re.sub(pat, rep, key)
            leaf_str = (leaf_name.key if hasattr(leaf_name, "key")
                        else str(leaf_name))
            t = np.asarray(leaf, np.float32)
            if leaf_str == "kernel":
                if t.ndim == 4:
                    t = t.transpose(3, 2, 0, 1)
                elif t.ndim == 2:
                    t = t.T
            out[f"{key}.{W._LEAF_MAP[leaf_str]}"] = t
        return out

    tensors = to_torch(sdxl_pipe.params["unet"])
    back = {"params": W._convert_tree(
        sdxl_pipe.params["unet"]["params"], tensors,
        key_rewrites=W._SDXL_UNET_REWRITES,
    )}
    _assert_trees_equal(sdxl_pipe.params["unet"], back)


def test_roundtrip_sdxl_text2(sdxl_pipe):
    tensors = _hf_text2_layout(sdxl_pipe.params["text2"])
    back = W.convert_sdxl_text2(sdxl_pipe.params["text2"], tensors)
    _assert_trees_equal(sdxl_pipe.params["text2"], back)
