"""Checkpoint conversion: HF/diffusers SD-1.5 safetensors -> Flax param trees.

The reference loads SD-1.5 through diffusers `StableDiffusionPipeline
.from_pretrained` (/root/reference/src/demo/model.py:94, checkpoint layout
described in /root/reference/scripts/download_models.sh).  This module maps
that on-disk layout (unet/ vae/ text_encoder/ subfolders with
*.safetensors) onto the freefine_tpu Flax modules:

  * torch conv kernels [O, I, kh, kw] -> flax [kh, kw, I, O]
  * torch linear [O, I]               -> flax [I, O]
  * norm weight/bias                  -> scale/bias
  * VAE attention supports both the new (to_q/to_k/to_v/to_out.0) and the
    legacy (query/key/value/proj_attn) diffusers naming.

Conversion is *tree-driven*: we walk the randomly-initialised Flax tree,
derive the diffusers key for every leaf, and copy with shape validation —
so any architecture mismatch fails loudly at load time.

No torch dependency: safetensors' numpy backend reads the files directly.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from safetensors import safe_open
except ImportError:  # pragma: no cover
    safe_open = None


def _load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors files under `path` into one dict (numpy)."""
    assert safe_open is not None, "safetensors is required for weight loading"
    out: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


_SEGMENT_FIXES = [
    ("_resnets", ".resnets"),
    ("_attentions", ".attentions"),
    ("_downsamplers", ".downsamplers"),
    ("_upsamplers", ".upsamplers"),
    ("transformer_blocks_0", "transformer_blocks.0"),
    ("net_0", "net.0"),
    ("net_2", "net.2"),
    ("to_out_0", "to_out.0"),
]


def _module_to_diffusers(seg: str) -> str:
    """One flax module-name segment -> dotted diffusers path piece."""
    for a, b in _SEGMENT_FIXES:
        seg = seg.replace(a, b)
    # down_blocks_0 -> down_blocks.0, layers_11 -> layers.11, etc.
    seg = re.sub(r"_(\d+)$", r".\1", seg)
    seg = re.sub(r"_(\d+)\.", r".\1.", seg)
    # names whose trailing digit is part of the diffusers name itself
    seg = seg.replace("linear.1", "linear_1").replace("linear.2", "linear_2")
    return seg


def _flax_path_to_key(path) -> str:
    segs = []
    for p in path:
        name = p.key if hasattr(p, "key") else str(p)
        if name in ("params", "GroupNorm_0", "LayerNorm_0"):
            continue  # wrapper modules share the parent's diffusers name
        segs.append(_module_to_diffusers(name))
    return ".".join(segs)


_LEAF_MAP = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "embedding": "weight",
    # PixArt AdaLN-single tables are bare [6, D]/[2, D] params whose
    # diffusers key carries no .weight suffix
    "scale_shift_table": "scale_shift_table",
}


def _fetch(tensors: Dict[str, np.ndarray], key: str, leaf: str, shape, aliases=()):
    """Fetch + reshape a torch tensor for a flax leaf; raise with context."""
    tkey = f"{key}.{_LEAF_MAP[leaf]}" if key else _LEAF_MAP[leaf]
    cand = [tkey] + [f"{a}.{_LEAF_MAP[leaf]}" for a in aliases]
    for c in cand:
        if c in tensors:
            t = np.asarray(tensors[c])
            if leaf == "kernel":
                if t.ndim == 4:      # conv OIHW -> HWIO
                    t = t.transpose(2, 3, 1, 0)
                elif t.ndim == 2:    # linear OI -> IO
                    t = t.T
                elif t.ndim == 1:
                    pass
            if t.shape != tuple(shape):
                # legacy VAE attention stores 1x1 convs for q/k/v
                if t.ndim == 4 and t.shape[0] == 1 and t.shape[1] == 1:
                    t = t.reshape(t.shape[2], t.shape[3])
                if t.shape != tuple(shape):
                    raise ValueError(
                        f"shape mismatch for {c}: ckpt {t.shape} vs flax {tuple(shape)}"
                    )
            return t
    raise KeyError(f"missing checkpoint tensor for flax leaf {tkey} (tried {cand})")


_VAE_ATTN_ALIASES = {
    "to_q": "query",
    "to_k": "key",
    "to_v": "value",
    "to_out.0": "proj_attn",
}


def _convert_tree(flax_params, tensors: Dict[str, np.ndarray], prefix: str = "",
                  key_rewrites=(), dtype=None):
    """Walk the flax tree, pull matching tensors."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        key = _flax_path_to_key(mods)
        for pat, rep in key_rewrites:
            key = re.sub(pat, rep, key)
        if prefix:
            key = f"{prefix}.{key}" if key else prefix
        aliases = []
        for new, old in _VAE_ATTN_ALIASES.items():
            if key.endswith(new):
                aliases.append(key[: -len(new)] + old)
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        t = _fetch(tensors, key, leaf_str, leaf.shape, aliases)
        leaves.append(jnp.asarray(t, dtype or leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# -- per-model rewrites -------------------------------------------------------

_UNET_REWRITES = ()

_TEXT_REWRITES = (
    (r"^token_embedding", "text_model.embeddings.token_embedding"),
    (r"^position_embedding", "text_model.embeddings.position_embedding"),
    (r"^layers\.", "text_model.encoder.layers."),
    (r"^final_layer_norm", "text_model.final_layer_norm"),
)


def expected_checkpoint_manifest(flax_params, key_rewrites=()) -> Dict[str, tuple]:
    """diffusers key -> expected TORCH shape for every leaf the converter
    will fetch (the inverse of `_fetch`'s transposition: conv HWIO->OIHW,
    linear IO->OI).  Powers the full-topology manifest tests
    (tests/test_weight_manifest.py) that pin the model structure against
    the committed diffusers key+shape fixtures."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    out: Dict[str, tuple] = {}
    for path, leaf in flat:
        *mods, leaf_name = path
        key = _flax_path_to_key(mods)
        for pat, rep in key_rewrites:
            key = re.sub(pat, rep, key)
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        shape = tuple(leaf.shape)
        if leaf_str == "kernel":
            if len(shape) == 4:      # HWIO -> OIHW
                shape = (shape[3], shape[2], shape[0], shape[1])
            elif len(shape) == 2:    # IO -> OI
                shape = (shape[1], shape[0])
        tkey = f"{key}.{_LEAF_MAP[leaf_str]}" if key else _LEAF_MAP[leaf_str]
        out[tkey] = shape
    return out


def convert_unet(flax_params, tensors, dtype=None):
    return {"params": _convert_tree(flax_params["params"], tensors,
                                    key_rewrites=_UNET_REWRITES, dtype=dtype)}


_VAE_KEY_REWRITES = (
    (r"\.mid\.resnets", ".mid_block.resnets"),
    (r"\.mid\.attentions", ".mid_block.attentions"),
    (r"^encoder\.quant_conv$", "quant_conv"),
    (r"^decoder\.post_quant_conv$", "post_quant_conv"),
    (r"attentions\.0\.norm$", "attentions.0.group_norm"),
)


_PIXART_REWRITES = (
    # flax module path (after _module_to_diffusers) -> diffusers
    # PixArtTransformer2DModel key (PixArt-alpha/PixArt-XL-2-*)
    (r"^patch_embed", "pos_embed.proj"),
    (r"^time_embedding", "adaln_single.emb.timestep_embedder"),
    (r"^t_block", "adaln_single.linear"),
    (r"^caption_proj\.1", "caption_projection.linear_1"),
    (r"^caption_proj\.2", "caption_projection.linear_2"),
    (r"^blocks\.", "transformer_blocks."),
    (r"ff_net\.0_proj", "ff.net.0.proj"),
    (r"ff_net\.2", "ff.net.2"),
)


def convert_pixart_transformer(flax_params, tensors, dtype=None):
    """diffusers PixArtTransformer2DModel state dict -> DiT2DCondition tree.

    Layout: pos_embed.proj (patchify conv), adaln_single (timestep_embedder
    + shared 6D linear), caption_projection, transformer_blocks.{i} with
    scale_shift_table / attn1 / attn2 / ff.net.{0.proj,2}, top-level
    scale_shift_table + proj_out.  The fixed sincos position table is
    recomputed, not loaded (diffusers buffers it, non-persistent in recent
    versions).  Manifest fixture: tests/fixtures/pixart_xl2_keys.txt."""
    return {"params": _convert_tree(flax_params["params"], tensors,
                                    key_rewrites=_PIXART_REWRITES,
                                    dtype=dtype)}


def convert_t5_encoder(flax_params, tensors, dtype=None):
    """HF T5EncoderModel state dict -> models.t5.T5Encoder tree.

    The PixArt caption tower (google/t5-v1_1-xxl `text_encoder` subfolder).
    Bespoke mapping (T5's layer.{0,1} nesting doesn't fit the generic
    diffusers walker): shared embedding, per-block SelfAttention q/k/v/o
    (transposed OI->IO), gated FF wi_0/wi_1/wo, RMSNorm weights, and the
    block-0 relative_attention_bias table shared by every layer.
    Torch-parity-tested at tiny scale in tests/test_hf_parity.py."""
    src = {k: np.asarray(v) for k, v in tensors.items()}

    def g(key, leaf_dtype, transpose=False):
        t = src[key]
        if transpose:
            t = t.T
        return jnp.asarray(t, dtype or leaf_dtype)

    ref = flax_params["params"]
    f32 = jnp.float32
    out = {
        "shared": g("shared.weight", f32),
        "relative_attention_bias": g(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight", f32,
        ),
        "final_layer_norm": {
            "weight": g("encoder.final_layer_norm.weight", f32)
        },
    }
    n = sum(1 for k in ref if k.startswith("block_"))
    for i in range(n):
        b = f"encoder.block.{i}"
        blk_dtype = ref[f"block_{i}"]["attn"]["q"]["kernel"].dtype
        out[f"block_{i}"] = {
            "attn": {
                x: {"kernel": g(
                    f"{b}.layer.0.SelfAttention.{x}.weight", blk_dtype,
                    transpose=True,
                )}
                for x in ("q", "k", "v", "o")
            },
            "norm_attn": {
                "weight": g(f"{b}.layer.0.layer_norm.weight", f32)
            },
            "norm_ff": {
                "weight": g(f"{b}.layer.1.layer_norm.weight", f32)
            },
            "wi_0": {"kernel": g(
                f"{b}.layer.1.DenseReluDense.wi_0.weight", blk_dtype,
                transpose=True,
            )},
            "wi_1": {"kernel": g(
                f"{b}.layer.1.DenseReluDense.wi_1.weight", blk_dtype,
                transpose=True,
            )},
            "wo": {"kernel": g(
                f"{b}.layer.1.DenseReluDense.wo.weight", blk_dtype,
                transpose=True,
            )},
        }
    def _check(a, b):
        if a.shape != b.shape:
            raise ValueError(f"T5 shape mismatch {a.shape} vs {b.shape}")
        return a

    jax.tree_util.tree_map(_check, out, dict(ref))
    return {"params": out}


def convert_vae(flax_params, tensors, dtype=None):
    # my VAE modules are named mid_resnets_0 etc -> encoder.mid.resnets.0
    p = _convert_tree(flax_params["params"], tensors,
                      key_rewrites=_VAE_KEY_REWRITES, dtype=dtype)
    return {"params": p}


def convert_text_encoder(flax_params, tensors, dtype=None):
    return {"params": _convert_tree(flax_params["params"], tensors,
                                    key_rewrites=_TEXT_REWRITES, dtype=dtype)}


# -- perception / metric encoders ---------------------------------------------

_DINOV2_REWRITES = (
    # flax DINOv2 module names -> torchhub dinov2 state_dict keys
    (r"^patch_embed$", "patch_embed.proj"),
    (r"^blocks\.(\d+)\.attn\.", r"blocks.\1.attn."),
    (r"\.mlp_fc1$", ".mlp.fc1"),
    (r"\.mlp_fc2$", ".mlp.fc2"),
    (r"\.ls1$", ".ls1"),
    (r"\.ls2$", ".ls2"),
)


def convert_dinov2(flax_params, tensors, dtype=None):
    """torchhub dinov2 (or DINOv1 ViT) state dict -> flax DINOv2 params.

    Handles: cls_token/pos_embed buffers, LayerScale gamma (filled with
    ones for DINOv1 checkpoints that lack it), fused qkv.
    """
    t = dict(tensors)
    # bare parameter tensors that are not weight/bias pairs
    passthrough = {"cls_token": "cls_token", "pos_embed": "pos_embed"}
    # DINOv1 compat: no layerscale; synthesise ones lazily in _fetch via a
    # pre-pass that adds gamma tensors when missing.
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    for path, leaf in flat:
        key = ".".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        if key.endswith("gamma"):
            tk = key.replace("blocks_", "blocks.").replace(".gamma", ".gamma")
            tk = re.sub(r"blocks\.(\d+)\.(ls[12])\.gamma", r"blocks.\1.\2.gamma", tk)
            if tk not in t:
                t[tk] = np.ones(leaf.shape, np.float32)

    leaves = []
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        segs = [s for s in segs if s not in ("GroupNorm_0", "LayerNorm_0")]
        key = ".".join(_module_to_diffusers(s) for s in segs)
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        if leaf_str == "gamma":
            tk = f"{key}.gamma"
            arr = np.asarray(t[tk])
        elif key in passthrough and leaf_str in ("cls_token", "pos_embed"):
            arr = np.asarray(t[leaf_str])
        elif key == "" and leaf_str in ("cls_token", "pos_embed"):
            arr = np.asarray(t[leaf_str])
        else:
            k2 = key
            k2 = k2.replace("patch_embed", "patch_embed.proj")
            k2 = k2.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
            arr = _fetch(t, k2, leaf_str, leaf.shape)
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}.{leaf_str}: {arr.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


_CLIP_VISION_REWRITES = (
    (r"^patch_embedding", "vision_model.embeddings.patch_embedding"),
    (r"^layers\.", "vision_model.encoder.layers."),
    (r"^pre_layrnorm", "vision_model.pre_layrnorm"),
    (r"^post_layernorm", "vision_model.post_layernorm"),
)


def convert_clip_vision(flax_params, tensors, dtype=None):
    """HF CLIPModel (vision tower + visual_projection) -> flax params."""
    t = dict(tensors)
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        segs = [s for s in segs if s not in ("GroupNorm_0", "LayerNorm_0")]
        key = ".".join(_module_to_diffusers(s) for s in segs)
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        if leaf_str == "class_embedding":
            arr = np.asarray(t["vision_model.embeddings.class_embedding"])
        elif leaf_str == "position_embedding":
            arr = np.asarray(t["vision_model.embeddings.position_embedding.weight"])
        elif leaf_str == "visual_projection":
            arr = np.asarray(t["visual_projection.weight"]).T
        else:
            for pat, rep in _CLIP_VISION_REWRITES:
                key = re.sub(pat, rep, key)
            arr = _fetch(t, key, leaf_str, leaf.shape)
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}.{leaf_str}: {arr.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


def convert_inception_fid(flax_params, tensors, dtype=None):
    """pytorch-fid / torchvision inception state dict -> flax InceptionV3FID.

    torch naming: <block>.conv.weight + <block>.bn.{weight,bias,
    running_mean,running_var}; flax leaves: conv/kernel + bn_scale/bn_bias/
    bn_mean/bn_var under the same block path."""
    leaf_map = {
        "kernel": ("conv.weight", True),
        "bn_scale": ("bn.weight", False),
        "bn_bias": ("bn.bias", False),
        "bn_mean": ("bn.running_mean", False),
        "bn_var": ("bn.running_var", False),
    }
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        # the flax tree nests BNConv params one level deeper ('conv' module
        # for the kernel); drop a trailing 'conv' segment
        if segs and segs[-1] == "conv":
            segs = segs[:-1]
        suffix, is_conv = leaf_map[leaf_str]
        key = ".".join(segs + [suffix])
        t = np.asarray(tensors[key])
        if is_conv:
            t = t.transpose(2, 3, 1, 0)
        if t.shape != tuple(leaf.shape):
            raise ValueError(f"{key}: {t.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(t, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """HBM-resident serving cast: matmul/conv kernels (ndim >= 2) to
    `dtype`, norm scales/biases and other 1-D params kept f32.

    On a 16 GB v5e chip the f32 SDXL stack (~14 GB: 2.6B UNet + bigG tower)
    does not leave working room — bf16 weights are the production layout,
    and they halve the per-pass weight HBM traffic for every backbone.
    The golden-comparison path keeps f32 storage (tests vs diffusers)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if getattr(x, "ndim", 0) >= 2 and x.dtype == jnp.float32
        else x,
        params,
    )


def save_params(params, path: str):
    """Serialise a converted param tree to msgpack (metric encoders cache)."""
    import flax.serialization

    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, params)
        ))


def load_sd15(pipe, checkpoint_dir: str, dtype: Optional[jnp.dtype] = None) -> dict:
    """Convert a diffusers SD-1.5 checkpoint dir into freefine_tpu params.

    `pipe` is a `freefine_tpu.pipeline.FreeFine` built with
    `init_random=True` (its random tree supplies structure + shapes).
    Expects `checkpoint_dir/{unet,vae,text_encoder}/*.safetensors`.

    The conversion is tree-driven, so the same function loads any
    single-encoder diffusers SD layout — including SD-2.1 (the MD
    metric's DIFT backbone) with a `sd21_pipeline_config()` pipe; the
    expected key+shape sets are pinned by tests/test_weight_manifest.py.
    """
    unet_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "unet"))
    vae_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "vae"))
    text_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "text_encoder"))
    params = {
        "unet": convert_unet(pipe.params["unet"], unet_t, dtype),
        "vae": convert_vae(pipe.params["vae"], vae_t, dtype),
        "text": convert_text_encoder(pipe.params["text"], text_t, dtype),
    }
    return params


def load_pixart(pipe, checkpoint_dir: str, dtype: Optional[jnp.dtype] = None) -> dict:
    """Convert a diffusers PixArt-α checkpoint dir into freefine_tpu params.

    `pipe` is a `FreeFine` built with `pixart_pipeline_config()` +
    `init_random=True`.  Expects
    `checkpoint_dir/{transformer,vae,text_encoder}/*.safetensors`
    (the published PixArt-alpha/PixArt-XL-2-512x512 layout: PixArt
    transformer + SD VAE + T5-XXL encoder).  Topology pinned by
    tests/test_weight_manifest.py (transformer) and
    tests/test_hf_parity.py::test_t5_encoder_parity_vs_transformers."""
    tr_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "transformer"))
    vae_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "vae"))
    text_t = _load_safetensors_dir(
        os.path.join(checkpoint_dir, "text_encoder")
    )
    return {
        "unet": convert_pixart_transformer(pipe.params["unet"], tr_t, dtype),
        "vae": convert_vae(pipe.params["vae"], vae_t, dtype),
        "text": convert_t5_encoder(pipe.params["text"], text_t, dtype),
    }


_SDXL_UNET_REWRITES = (
    # our added-conditioning MLP Dense names -> diffusers add_embedding
    (r"add_embedding\.1$", "add_embedding.linear_1"),
    (r"add_embedding\.2$", "add_embedding.linear_2"),
)


def convert_sdxl_text2(flax_params, tensors, dtype=None):
    """HF CLIPTextModelWithProjection (SDXL text_encoder_2) state dict ->
    flax OpenCLIPTextHidden params.

    HF stores separate q/k/v projections; our tower uses the OpenCLIP fused
    in_proj, so the three are concatenated (q,k,v order — matching the
    jnp.split in models/open_clip_text.py).  text_projection is a bias-free
    Linear whose weight transposes into our [width, proj] param.
    """
    t = dict(tensors)
    pre = "text_model."
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        segs = [s for s in segs if s != "LayerNorm_0"]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(_module_to_diffusers(s) for s in segs)
        suffix = _LEAF_MAP.get(leaf_str)  # None for bare params (pos/proj)
        if leaf_str == "positional_embedding":
            arr = np.asarray(t[f"{pre}embeddings.position_embedding.weight"])
        elif leaf_str == "text_projection":
            arr = np.asarray(t["text_projection.weight"]).T
        elif key.startswith("token_embedding"):
            arr = np.asarray(t[f"{pre}embeddings.token_embedding.weight"])
        elif key.startswith("ln_final"):
            arr = np.asarray(t[f"{pre}final_layer_norm.{suffix}"])
        else:
            m = re.match(r"resblocks\.(\d+)\.(.+)", key)
            assert m, key
            base = f"{pre}encoder.layers.{m.group(1)}"
            sub = m.group(2)
            if sub == "in_proj":
                parts = [
                    np.asarray(t[f"{base}.self_attn.{p}_proj.{suffix}"])
                    for p in ("q", "k", "v")
                ]
                if leaf_str == "kernel":
                    arr = np.concatenate([p.T for p in parts], axis=-1)
                else:
                    arr = np.concatenate(parts, axis=-1)
            else:
                hf_sub = {
                    "ln.1": "layer_norm1", "ln.2": "layer_norm2",
                    "out_proj": "self_attn.out_proj",
                    "mlp_fc": "mlp.fc1", "mlp_proj": "mlp.fc2",
                }[sub]
                arr = np.asarray(t[f"{base}.{hf_sub}.{suffix}"])
                if leaf_str == "kernel" and arr.ndim == 2:
                    arr = arr.T
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}.{leaf_str}: {arr.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


def load_sdxl(pipe, checkpoint_dir: str, dtype: Optional[jnp.dtype] = None) -> dict:
    """Convert a diffusers SDXL-base checkpoint dir into SDXLFreeFine params.

    Expects `checkpoint_dir/{unet,vae,text_encoder,text_encoder_2}/
    *.safetensors` (the stock stable-diffusion-xl-base layout).
    """
    unet_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "unet"))
    vae_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "vae"))
    text_t = _load_safetensors_dir(os.path.join(checkpoint_dir, "text_encoder"))
    text2_t = _load_safetensors_dir(
        os.path.join(checkpoint_dir, "text_encoder_2")
    )
    params = {
        "unet": {"params": _convert_tree(
            pipe.params["unet"]["params"], unet_t,
            key_rewrites=_SDXL_UNET_REWRITES, dtype=dtype,
        )},
        "vae": convert_vae(pipe.params["vae"], vae_t, dtype),
        "text": convert_text_encoder(pipe.params["text"], text_t, dtype),
        "text2": convert_sdxl_text2(pipe.params["text2"], text2_t, dtype),
    }
    pipe.params = params
    return params


# -- OpenCLIP (HPSv2.1) and BLIP (ImageReward) ---------------------------------


def convert_open_clip_text(flax_params, tensors, prefix="text.", dtype=None):
    """open_clip text tower state dict -> flax OpenCLIPText params.

    open_clip names: {prefix}token_embedding.weight, {prefix}positional_
    embedding, {prefix}transformer.resblocks.N.{ln_1,ln_2}.{weight,bias},
    ...attn.{in_proj_weight,in_proj_bias,out_proj.*}, ...mlp.{c_fc,c_proj}.*,
    {prefix}ln_final.*, {prefix}text_projection.  HPSv2.1 checkpoints use
    prefix ''/'text.' depending on packaging — pass accordingly.
    """
    t = dict(tensors)
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        segs = [s for s in segs if s not in ("LayerNorm_0",)]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(_module_to_diffusers(s) for s in segs)
        if leaf_str == "positional_embedding":
            arr = np.asarray(t[f"{prefix}positional_embedding"])
        elif leaf_str == "text_projection":
            arr = np.asarray(t[f"{prefix}text_projection"])
        elif key.startswith("token_embedding"):
            arr = np.asarray(t[f"{prefix}token_embedding.weight"])
        elif key.startswith("ln_final"):
            arr = np.asarray(t[f"{prefix}ln_final.{_LEAF_MAP[leaf_str]}"])
        else:
            # resblocks.N.(in_proj|out_proj|mlp_fc|mlp_proj|ln_1|ln_2)
            k2 = key.replace("resblocks.", f"{prefix}transformer.resblocks.")
            # _module_to_diffusers splits trailing digits (ln_1 -> ln.1), but
            # open_clip's real module names keep the underscore
            k2 = k2.replace(".ln.1", ".ln_1").replace(".ln.2", ".ln_2")
            k2 = k2.replace(".in_proj", ".attn.in_proj")
            k2 = k2.replace(".out_proj", ".attn.out_proj")
            k2 = k2.replace(".mlp_fc", ".mlp.c_fc")
            k2 = k2.replace(".mlp_proj", ".mlp.c_proj")
            suffix = _LEAF_MAP[leaf_str]
            # in_proj stores weight/bias without the '.weight' dot form
            if k2.endswith("attn.in_proj"):
                k2 = k2 + ("_weight" if leaf_str == "kernel" else "_bias")
                arr = np.asarray(t[k2])
                if leaf_str == "kernel":
                    arr = arr.T
            else:
                arr = np.asarray(t[f"{k2}.{suffix}"])
                if leaf_str == "kernel" and arr.ndim == 2:
                    arr = arr.T
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}.{leaf_str}: {arr.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


def convert_open_clip_vision(flax_params, tensors, prefix="visual.", dtype=None):
    """open_clip vision tower state dict -> flax CLIPImageEncoder params.

    The HPSv2.1 checkpoint's image side (human_preference_score.py:8-39
    loads `ViT-H-14` via open_clip) stores: {prefix}class_embedding,
    {prefix}positional_embedding, {prefix}conv1.weight (bias-free patch
    stem), {prefix}ln_pre/{prefix}ln_post, {prefix}proj (already
    [width, proj_dim] — no transpose), and per block
    {prefix}transformer.resblocks.N.{ln_1,ln_2,attn.in_proj_weight,
    attn.in_proj_bias,attn.out_proj,mlp.c_fc,mlp.c_proj}.  The fused
    in_proj rows split (q, k, v) into our separate projections."""
    t = dict(tensors)
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        segs = [s for s in segs if s not in ("LayerNorm_0",)]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(_module_to_diffusers(s) for s in segs)
        suffix = _LEAF_MAP.get(leaf_str)
        if leaf_str == "class_embedding":
            arr = np.asarray(t[f"{prefix}class_embedding"])
        elif leaf_str == "position_embedding":
            arr = np.asarray(t[f"{prefix}positional_embedding"])
        elif leaf_str == "visual_projection":
            arr = np.asarray(t[f"{prefix}proj"])
        elif key.startswith("patch_embedding"):
            # torch conv OIHW -> flax HWIO
            arr = np.asarray(t[f"{prefix}conv1.weight"]).transpose(2, 3, 1, 0)
        elif key.startswith("pre_layrnorm"):
            arr = np.asarray(t[f"{prefix}ln_pre.{suffix}"])
        elif key.startswith("post_layernorm"):
            arr = np.asarray(t[f"{prefix}ln_post.{suffix}"])
        else:
            m = re.match(r"layers\.(\d+)\.(.+)", key)
            assert m, key
            base = f"{prefix}transformer.resblocks.{m.group(1)}"
            sub = m.group(2)
            if sub.startswith("self_attn.") and sub != "self_attn.out_proj":
                which = {"q": 0, "k": 1, "v": 2}[sub.split(".")[1][0]]
                fused = np.asarray(
                    t[f"{base}.attn.in_proj_"
                      + ("weight" if leaf_str == "kernel" else "bias")]
                )
                arr = np.split(fused, 3, axis=0)[which]
                if leaf_str == "kernel":
                    arr = arr.T
            else:
                oc_sub = {
                    "layer_norm1": "ln_1", "layer_norm2": "ln_2",
                    "self_attn.out_proj": "attn.out_proj",
                    "mlp.fc1": "mlp.c_fc", "mlp.fc2": "mlp.c_proj",
                }[sub]
                arr = np.asarray(t[f"{base}.{oc_sub}.{suffix}"])
                if leaf_str == "kernel" and arr.ndim == 2:
                    arr = arr.T
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}.{leaf_str}: {arr.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


def load_hps(image_flax_params, text_flax_params, ckpt_path: str, dtype=None):
    """HPSv2.1 checkpoint (.pt, an open_clip ViT-H-14 state dict — the
    reference loads it at human_preference_score.py:31-39) ->
    (image_params, text_params) for CLIPImageEncoder(clip_vit_h14()) and
    OpenCLIPText(open_clip_text_h14())."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    tensors = {k: v.numpy() for k, v in sd.items()}
    return (
        convert_open_clip_vision(
            image_flax_params, tensors, prefix="visual.", dtype=dtype
        ),
        convert_open_clip_text(text_flax_params, tensors, prefix="", dtype=dtype),
    )


def u2net_torch_key(path_segs, leaf_str):
    """Map one flax U2Net leaf to its official U-2-Net state-dict key.

    The published u2net.pth / u2netp.pth (xuebinqin/U-2-Net — the weights
    rembg repackages as its onnx sessions; reference `get_mask_from_rembg`,
    src/demo/model.py:982-1006) name every conv+BN pair through the
    REBNCONV module's `conv_s1` / `bn_s1` children; side and fuse convs are
    plain `sideN.weight` / `outconv.weight`."""
    segs = list(path_segs)
    if segs and segs[-1] == "conv":  # ConvBNReLU's conv submodule
        return ".".join(segs[:-1]) + ".conv_s1." + (
            "weight" if leaf_str == "kernel" else "bias"
        )
    bn = {
        "bn_scale": "bn_s1.weight",
        "bn_bias": "bn_s1.bias",
        "bn_mean": "bn_s1.running_mean",
        "bn_var": "bn_s1.running_var",
    }
    if leaf_str in bn:
        return ".".join(segs) + "." + bn[leaf_str]
    # side1..side6 / outconv plain convs
    return ".".join(segs) + "." + ("weight" if leaf_str == "kernel" else "bias")


def convert_u2net(flax_params, tensors, dtype=None):
    """Official U-2-Net state dict (u2net.pth / u2netp.pth layout) -> flax
    U2Net params.  Extra checkpoint entries (num_batches_tracked) are
    ignored; every flax leaf must resolve or this raises."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = u2net_torch_key(segs, leaf_str)
        if key not in tensors:
            raise KeyError(f"missing u2net checkpoint tensor {key}")
        arr = np.asarray(tensors[key])
        if leaf_str == "kernel":  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}: {arr.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


def load_u2net(flax_params, ckpt_path: str, dtype=None):
    """u2net.pth / u2netp.pth -> flax U2Net params (the rembg-replacement
    saliency path for the SV3D re-mask step)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    tensors = {k: v.numpy() for k, v in sd.items()}
    return convert_u2net(flax_params, tensors, dtype=dtype)


def convert_dino_v1(flax_params, tensors, dtype=None):
    """DINO-v1 ViT state dict (facebookresearch/dino torchhub layout —
    what SUBC's `dino_vitb16` uses, VBench/subject_consistency.py:10-16) ->
    flax DINOv2 params.

    The v1 checkpoint layout IS the torchhub layout `convert_dinov2`
    consumes (cls_token/pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,
    norm2,mlp.fc1,mlp.fc2}, norm) minus the LayerScale gammas, which
    convert_dinov2 synthesises as ones (a no-op scale).  Alias kept so the
    SUBC load path is explicit and independently tested
    (tests/test_hf_parity.py::test_dino_v1_parity_vs_transformers)."""
    return convert_dinov2(flax_params, tensors, dtype=dtype)


def load_dino_v1(flax_params, ckpt_path: str, dtype=None):
    """dino_vitb16_pretrain.pth (bare state dict) -> flax DINOv2 params for
    the SUBC encoder (metrics/consistency.make_dino_encoder)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    tensors = {k: v.numpy() for k, v in sd.items()}
    return convert_dino_v1(flax_params, tensors, dtype=dtype)


def convert_blip_image_reward(flax_params, tensors, dtype=None):
    """ImageReward-v1.0 state dict -> flax ImageReward params.

    ImageReward names: blip.visual_encoder.{cls_token,pos_embed,
    patch_embed.proj.*,blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}.*,norm.*}; blip.text_encoder.{embeddings.*,
    encoder.layer.N.{attention.self.{query,key,value},attention.output.
    {dense,LayerNorm},crossattention.self.*,crossattention.output.*,
    intermediate.dense,output.{dense,LayerNorm}}.*}; mlp.layers.{0,2,4,6,8}.*
    """
    t = dict(tensors)
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    mlp_map = {"mlp.0": "0", "mlp.1": "2", "mlp.2": "4", "mlp.3": "6",
               "mlp.4": "8"}
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        segs = [s for s in segs if s != "LayerNorm_0"]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = ".".join(_module_to_diffusers(s) for s in segs)
        suffix = _LEAF_MAP.get(leaf_str)

        if key.startswith("visual_encoder"):
            if leaf_str in ("cls_token", "pos_embed"):
                arr = np.asarray(t[f"blip.visual_encoder.{leaf_str}"])
            else:
                k2 = key.replace("visual_encoder.", "blip.visual_encoder.")
                k2 = k2.replace("patch_embed", "patch_embed.proj")
                k2 = k2.replace(".qkv", ".attn.qkv").replace(".proj", ".attn.proj") \
                    if ".blocks." in k2 and (".qkv" in k2 or k2.endswith(".proj")) else k2
                k2 = k2.replace(".mlp_fc1", ".mlp.fc1").replace(".mlp_fc2", ".mlp.fc2")
                arr = _fetch(t, k2, leaf_str, leaf.shape)
                leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
                continue
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
            arr = _fetch(t, k2, leaf_str, leaf.shape)
            leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
            continue
        elif key.startswith("mlp."):
            idx = mlp_map[key]
            arr = _fetch(t, f"mlp.layers.{idx}", leaf_str, leaf.shape)
            leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
            continue
        else:
            raise KeyError(f"unexpected ImageReward leaf {key}.{leaf_str}")
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}.{leaf_str}: {arr.shape} vs {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(arr, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


# -- Depth-Anything (HF transformers format) ------------------------------------


def hf_dinov2_to_torchhub(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, np.ndarray]:
    """Rename a transformers Dinov2Model/Dinov2Backbone state dict into the
    torchhub facebookresearch/dinov2 naming `convert_dinov2` expects."""
    t: Dict[str, np.ndarray] = {}
    g = lambda k: np.asarray(sd[prefix + k])
    t["cls_token"] = g("embeddings.cls_token")
    t["pos_embed"] = g("embeddings.position_embeddings")
    t["patch_embed.proj.weight"] = g("embeddings.patch_embeddings.projection.weight")
    t["patch_embed.proj.bias"] = g("embeddings.patch_embeddings.projection.bias")
    i = 0
    while f"{prefix}encoder.layer.{i}.norm1.weight" in sd:
        p = f"encoder.layer.{i}"
        t[f"blocks.{i}.attn.qkv.weight"] = np.concatenate(
            [g(f"{p}.attention.attention.{n}.weight") for n in ("query", "key", "value")], 0
        )
        t[f"blocks.{i}.attn.qkv.bias"] = np.concatenate(
            [g(f"{p}.attention.attention.{n}.bias") for n in ("query", "key", "value")], 0
        )
        t[f"blocks.{i}.attn.proj.weight"] = g(f"{p}.attention.output.dense.weight")
        t[f"blocks.{i}.attn.proj.bias"] = g(f"{p}.attention.output.dense.bias")
        for n in ("norm1", "norm2"):
            t[f"blocks.{i}.{n}.weight"] = g(f"{p}.{n}.weight")
            t[f"blocks.{i}.{n}.bias"] = g(f"{p}.{n}.bias")
        t[f"blocks.{i}.ls1.gamma"] = g(f"{p}.layer_scale1.lambda1")
        t[f"blocks.{i}.ls2.gamma"] = g(f"{p}.layer_scale2.lambda1")
        t[f"blocks.{i}.mlp.fc1.weight"] = g(f"{p}.mlp.fc1.weight")
        t[f"blocks.{i}.mlp.fc1.bias"] = g(f"{p}.mlp.fc1.bias")
        t[f"blocks.{i}.mlp.fc2.weight"] = g(f"{p}.mlp.fc2.weight")
        t[f"blocks.{i}.mlp.fc2.bias"] = g(f"{p}.mlp.fc2.bias")
        i += 1
    if prefix + "layernorm.weight" in sd:
        t["norm.weight"] = g("layernorm.weight")
        t["norm.bias"] = g("layernorm.bias")
    return t


def convert_depth_anything_hf(flax_params, tensors, dtype=None):
    """transformers DepthAnythingForDepthEstimation state dict -> flax
    `models.depth_anything.DepthAnything` params.

    Naming map: backbone.* -> pretrained.* (via hf_dinov2_to_torchhub);
    neck.reassemble_stage.layers.i.{projection,resize} -> depth_head.
    {projects_i,resize_i}; neck.convs.i -> depth_head.layer{i+1}_rn;
    neck.fusion_stage.layers.j -> depth_head.refinenet{4-j}; head.conv{1,2,3}
    -> depth_head.output_conv{1,2_0,2_2}.
    """
    backbone_t = hf_dinov2_to_torchhub(tensors, "backbone.")
    # HF Dinov2Backbone has no final layernorm when apply_layernorm uses
    # hidden-state norms; fall back to ones/zeros if absent.
    out = {}

    pre = flax_params["params"]["pretrained"]
    # the backbone may lack norm.* (Dinov2Backbone) — synthesize identity
    flat_pre = jax.tree_util.tree_flatten_with_path({"norm": pre.get("norm", {})})[0]
    if "norm.weight" not in backbone_t:
        for path, leaf in flat_pre:
            leaf_str = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if leaf_str == "scale":
                backbone_t["norm.weight"] = np.ones(leaf.shape, np.float32)
            elif leaf_str == "bias":
                backbone_t["norm.bias"] = np.zeros(leaf.shape, np.float32)
    out["pretrained"] = convert_dinov2({"params": pre}, backbone_t, dtype)["params"]

    head = flax_params["params"]["depth_head"]
    fusion_map = {"refinenet4": 0, "refinenet3": 1, "refinenet2": 2, "refinenet1": 3}

    def conv(key, leaf, transpose_deconv=False):
        t = np.asarray(tensors[key])
        if t.ndim == 4:
            if transpose_deconv:
                # torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out]
                t = t.transpose(2, 3, 0, 1)
            else:
                t = t.transpose(2, 3, 1, 0)
        if t.shape != tuple(leaf.shape):
            raise ValueError(f"{key}: {t.shape} vs {tuple(leaf.shape)}")
        return jnp.asarray(t, dtype or leaf.dtype)

    new_head = {}
    for name, sub in head.items():
        if name.startswith("projects_"):
            i = name.split("_")[1]
            new_head[name] = {
                "kernel": conv(f"neck.reassemble_stage.layers.{i}.projection.weight",
                               sub["kernel"]),
                "bias": conv(f"neck.reassemble_stage.layers.{i}.projection.bias",
                             sub["bias"]),
            }
        elif name.startswith("resize_"):
            i = name.split("_")[1]
            deconv = i in ("0", "1")
            new_head[name] = {
                "kernel": conv(f"neck.reassemble_stage.layers.{i}.resize.weight",
                               sub["kernel"], transpose_deconv=deconv),
                "bias": conv(f"neck.reassemble_stage.layers.{i}.resize.bias",
                             sub["bias"]),
            }
        elif name.endswith("_rn"):
            i = int(name[len("layer"):-len("_rn")]) - 1
            new_head[name] = {
                "kernel": conv(f"neck.convs.{i}.weight", sub["kernel"]),
            }
        elif name.startswith("refinenet"):
            j = fusion_map[name]
            base = f"neck.fusion_stage.layers.{j}"
            blk = {}
            for rname, rtorch in (("resConfUnit1", "residual_layer1"),
                                  ("resConfUnit2", "residual_layer2")):
                if rname not in sub:
                    continue
                blk[rname] = {
                    "conv1": {
                        "kernel": conv(f"{base}.{rtorch}.convolution1.weight",
                                       sub[rname]["conv1"]["kernel"]),
                        "bias": conv(f"{base}.{rtorch}.convolution1.bias",
                                     sub[rname]["conv1"]["bias"]),
                    },
                    "conv2": {
                        "kernel": conv(f"{base}.{rtorch}.convolution2.weight",
                                       sub[rname]["conv2"]["kernel"]),
                        "bias": conv(f"{base}.{rtorch}.convolution2.bias",
                                     sub[rname]["conv2"]["bias"]),
                    },
                }
            blk["out_conv"] = {
                "kernel": conv(f"{base}.projection.weight", sub["out_conv"]["kernel"]),
                "bias": conv(f"{base}.projection.bias", sub["out_conv"]["bias"]),
            }
            new_head[name] = blk
        elif name == "output_conv1":
            new_head[name] = {
                "kernel": conv("head.conv1.weight", sub["kernel"]),
                "bias": conv("head.conv1.bias", sub["bias"]),
            }
        elif name == "output_conv2_0":
            new_head[name] = {
                "kernel": conv("head.conv2.weight", sub["kernel"]),
                "bias": conv("head.conv2.bias", sub["bias"]),
            }
        elif name == "output_conv2_2":
            new_head[name] = {
                "kernel": conv("head.conv3.weight", sub["kernel"]),
                "bias": conv("head.conv3.bias", sub["bias"]),
            }
        else:
            raise KeyError(f"unexpected depth head module {name}")
    out["depth_head"] = new_head
    return {"params": out}


# -- EfficientSAM ---------------------------------------------------------------

_SAM_BARE_PARAMS = {
    # flax "<module-key>.<leaf>" -> exact torch state-dict key
    "image_encoder.pos_embed": "image_encoder.pos_embed",
    "prompt_encoder.positional_encoding_gaussian_matrix":
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
    "prompt_encoder.invalid_points": "prompt_encoder.invalid_points.weight",
    "prompt_encoder.point_embeddings": "prompt_encoder.point_embeddings.weight",
    "prompt_encoder.bbox_top_left_embeddings":
        "prompt_encoder.bbox_top_left_embeddings.weight",
    "prompt_encoder.bbox_bottom_right_embeddings":
        "prompt_encoder.bbox_bottom_right_embeddings.weight",
    "mask_decoder.iou_token": "mask_decoder.iou_token.weight",
    "mask_decoder.mask_tokens": "mask_decoder.mask_tokens.weight",
}

_SAM_REWRITES = (
    (r"^image_encoder\.patch_embed$", "image_encoder.patch_embed.proj"),
    (r"\.attn_qkv$", ".attn.qkv"),
    (r"\.attn_proj$", ".attn.proj"),
    (r"\.mlp_fc1$", ".mlp.fc1"),
    (r"\.mlp_fc2$", ".mlp.fc2"),
    (r"^mask_decoder\.layers\.", "mask_decoder.transformer.layers."),
    (r"^mask_decoder\.(final_attn_token_to_image|norm_final_attn)",
     r"mask_decoder.transformer.\1"),
    (r"^(mask_decoder\.transformer\.layers\.\d+)\.mlp\.layers\.(\d+)$",
     r"\1.mlp.layers.\2.0"),
    (r"^mask_decoder\.upscale\.(\d+)$",
     r"mask_decoder.final_output_upscaling_layers.\1.0"),
    (r"^mask_decoder\.upscale_norm\.(\d+)$",
     r"mask_decoder.final_output_upscaling_layers.\1.1"),
    (r"^mask_decoder\.hyper_mlps\.(\d+)\.layers\.(\d+)$",
     r"mask_decoder.output_hypernetworks_mlps.\1.layers.\2.0"),
    (r"^mask_decoder\.hyper_mlps\.(\d+)\.fc$",
     r"mask_decoder.output_hypernetworks_mlps.\1.fc"),
    (r"^mask_decoder\.iou_prediction_head\.layers\.(\d+)$",
     r"mask_decoder.iou_prediction_head.layers.\1.0"),
)


def convert_efficient_sam(flax_params, tensors, dtype=None):
    """Reference EfficientSam state dict (the vendored torch model,
    /root/reference/sam/efficient_sam/) -> flax `models.efficient_sam
    .EfficientSAM` params.  Golden-pinned end-to-end against the
    reference's own model in tests/test_reference_golden_sam.py.

    Layout notes beyond the usual OIHW/OI transposes: the mask-decoder
    upscalers are ConvTranspose2d — torch stores (in, out, kh, kw) and
    flax `nn.ConvTranspose` expects the SPATIALLY FLIPPED (kh, kw, in,
    out) kernel (lax.conv_transpose does not flip; torch's convT is the
    conv gradient, which does)."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    treedef = jax.tree_util.tree_structure(flax_params["params"])
    leaves = []
    for path, leaf in flat:
        *mods, leaf_name = path
        key = _flax_path_to_key(mods)
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        bare = f"{key}.{leaf_str}" if key else leaf_str
        if bare in _SAM_BARE_PARAMS:
            t = np.asarray(tensors[_SAM_BARE_PARAMS[bare]])
        else:
            for pat, rep in _SAM_REWRITES:
                key = re.sub(pat, rep, key)
            if re.search(r"final_output_upscaling_layers\.\d+\.0$", key) \
                    and leaf_str == "kernel":
                t = np.asarray(tensors[f"{key}.weight"])
                t = t.transpose(2, 3, 0, 1)[::-1, ::-1]  # convT: flip + IOHW
            elif leaf_str == "weight":  # LayerNorm2d holds weight/bias directly
                t = np.asarray(tensors[f"{key}.weight"])
            else:
                t = _fetch(tensors, key, leaf_str, leaf.shape)
        if t.shape != tuple(leaf.shape):
            raise ValueError(
                f"{bare}: ckpt {t.shape} vs flax {tuple(leaf.shape)}")
        leaves.append(jnp.asarray(t, dtype or leaf.dtype))
    return {"params": jax.tree_util.tree_unflatten(treedef, leaves)}


def load_efficient_sam(flax_params, ckpt_path: str, dtype=None):
    """Load an EfficientSAM .pt checkpoint (torch.save'd
    {"model": state_dict}, the layout of the published
    efficient_sam_vits.pt / efficient_sam_vitt.pt files the reference's
    build_efficient_sam loads)."""
    import torch  # local import: weights.py is otherwise torch-free

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = obj.get("model", obj)
    tensors = {k: v.numpy() for k, v in sd.items()}
    return convert_efficient_sam(flax_params, tensors, dtype=dtype)


# -- single-file LDM checkpoints (v1-5-pruned.safetensors style) ----------------

_LDM_UNET_PREFIX = "model.diffusion_model."
_LDM_VAE_PREFIX = "first_stage_model."
_LDM_TEXT_PREFIX = "cond_stage_model.transformer."


def _ldm_unet_to_diffusers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename LDM UNet keys (model.diffusion_model.*) to diffusers naming.

    SD-1.5 structure: input_blocks 0..11 (conv_in at 0; per level 2 res[+attn]
    then a downsample block), middle_block (res, attn, res), output_blocks
    0..11 (3 per level, upsample conv appended on the last of each level but
    the final), time_embed -> time_embedding.
    """
    out: Dict[str, np.ndarray] = {}

    def put(dst, src):
        out[dst] = sd[_LDM_UNET_PREFIX + src]

    def copy_res(dst_prefix, src_prefix):
        ren = {
            "in_layers.0": "norm1", "in_layers.2": "conv1",
            "emb_layers.1": "time_emb_proj",
            "out_layers.0": "norm2", "out_layers.3": "conv2",
            "skip_connection": "conv_shortcut",
        }
        for s, d in ren.items():
            for leaf in ("weight", "bias"):
                k = f"{_LDM_UNET_PREFIX}{src_prefix}.{s}.{leaf}"
                if k in sd:
                    out[f"{dst_prefix}.{d}.{leaf}"] = sd[k]

    def copy_attn(dst_prefix, src_prefix):
        for k in list(sd):
            if k.startswith(f"{_LDM_UNET_PREFIX}{src_prefix}."):
                suffix = k[len(f"{_LDM_UNET_PREFIX}{src_prefix}.") :]
                out[f"{dst_prefix}.{suffix}"] = sd[k]

    for leaf in ("weight", "bias"):
        put(f"conv_in.{leaf}", f"input_blocks.0.0.{leaf}")
        put(f"time_embedding.linear_1.{leaf}", f"time_embed.0.{leaf}")
        put(f"time_embedding.linear_2.{leaf}", f"time_embed.2.{leaf}")
        put(f"conv_norm_out.{leaf}", f"out.0.{leaf}")
        put(f"conv_out.{leaf}", f"out.2.{leaf}")

    # down: input_blocks i = 1..11; every 3rd (3, 6, 9) ends with a downsample
    for i in range(1, 12):
        level, j = (i - 1) // 3, (i - 1) % 3
        if j == 2:  # downsampler
            for leaf in ("weight", "bias"):
                k = f"{_LDM_UNET_PREFIX}input_blocks.{i}.0.op.{leaf}"
                if k in sd:
                    out[f"down_blocks.{level}.downsamplers.0.conv.{leaf}"] = sd[k]
            continue
        copy_res(f"down_blocks.{level}.resnets.{j}", f"input_blocks.{i}.0")
        copy_attn(f"down_blocks.{level}.attentions.{j}", f"input_blocks.{i}.1")

    copy_res("mid_block.resnets.0", "middle_block.0")
    copy_attn("mid_block.attentions.0", "middle_block.1")
    copy_res("mid_block.resnets.1", "middle_block.2")

    # up: output_blocks i = 0..11, 3 per level; upsampler on i = 2, 5, 8
    for i in range(12):
        level, j = i // 3, i % 3
        copy_res(f"up_blocks.{level}.resnets.{j}", f"output_blocks.{i}.0")
        # attention is module 1 unless this block only has an upsampler
        if f"{_LDM_UNET_PREFIX}output_blocks.{i}.1.transformer_blocks.0.attn1.to_q.weight" in sd:
            copy_attn(f"up_blocks.{level}.attentions.{j}", f"output_blocks.{i}.1")
        for mod in (1, 2):
            k = f"{_LDM_UNET_PREFIX}output_blocks.{i}.{mod}.conv.weight"
            if k in sd:
                out[f"up_blocks.{level}.upsamplers.0.conv.weight"] = sd[k]
                out[f"up_blocks.{level}.upsamplers.0.conv.bias"] = sd[
                    f"{_LDM_UNET_PREFIX}output_blocks.{i}.{mod}.conv.bias"
                ]
    return out


def _ldm_vae_to_diffusers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """first_stage_model.* -> diffusers AutoencoderKL naming."""
    out: Dict[str, np.ndarray] = {}
    ren_res = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
               "conv2": "conv2", "nin_shortcut": "conv_shortcut"}
    for k in list(sd):
        if not k.startswith(_LDM_VAE_PREFIX):
            continue
        s = k[len(_LDM_VAE_PREFIX):]
        d = None
        if s.startswith("encoder.down."):
            parts = s.split(".")
            lvl, kind = parts[2], parts[3]
            if kind == "block":
                sub = ren_res[parts[5]]
                d = f"encoder.down_blocks.{lvl}.resnets.{parts[4]}.{sub}.{parts[6]}"
            elif kind == "downsample":
                d = f"encoder.down_blocks.{lvl}.downsamplers.0.conv.{parts[5]}"
        elif s.startswith("decoder.up."):
            parts = s.split(".")
            lvl = 3 - int(parts[2])  # LDM numbers decoder ups bottom-up
            kind = parts[3]
            if kind == "block":
                sub = ren_res[parts[5]]
                d = f"decoder.up_blocks.{lvl}.resnets.{parts[4]}.{sub}.{parts[6]}"
            elif kind == "upsample":
                d = f"decoder.up_blocks.{lvl}.upsamplers.0.conv.{parts[5]}"
        elif ".mid.block_" in s:
            side, rest = s.split(".", 1)
            n = "0" if "block_1" in rest else "1"
            sub = ren_res[rest.split(".")[2]]
            d = f"{side}.mid_block.resnets.{n}.{sub}.{rest.split('.')[3]}"
        elif ".mid.attn_1." in s:
            side = s.split(".", 1)[0]
            name = s.split(".")[3]
            leaf = s.split(".")[4]
            attn_ren = {"norm": "group_norm", "q": "to_q", "k": "to_k",
                        "v": "to_v", "proj_out": "to_out.0"}
            d = f"{side}.mid_block.attentions.0.{attn_ren[name]}.{leaf}"
        elif s.startswith(("encoder.norm_out", "decoder.norm_out")):
            d = s.replace("norm_out", "conv_norm_out")
        elif s.startswith(("encoder.conv_in", "encoder.conv_out",
                           "decoder.conv_in", "decoder.conv_out",
                           "quant_conv", "post_quant_conv")):
            d = s
        if d is not None:
            out[d] = sd[k]
    return out


def load_sd15_single_file(pipe, ckpt_path: str, dtype=None) -> dict:
    """Convert a single-file LDM checkpoint (v1-5-pruned.safetensors /
    sd-v1-5.ckpt layout) into freefine_tpu params."""
    if ckpt_path.endswith(".safetensors"):
        assert safe_open is not None
        sd: Dict[str, np.ndarray] = {}
        with safe_open(ckpt_path, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    else:
        import torch

        raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        raw = raw.get("state_dict", raw)
        sd = {k: v.numpy() for k, v in raw.items()}

    unet_t = _ldm_unet_to_diffusers(sd)
    vae_t = _ldm_vae_to_diffusers(sd)
    text_t = {
        k[len(_LDM_TEXT_PREFIX):]: np.asarray(v)
        for k, v in sd.items() if k.startswith(_LDM_TEXT_PREFIX)
    }
    return {
        "unet": convert_unet(pipe.params["unet"], unet_t, dtype),
        "vae": convert_vae(pipe.params["vae"], vae_t, dtype),
        "text": convert_text_encoder(pipe.params["text"], text_t, dtype),
    }
