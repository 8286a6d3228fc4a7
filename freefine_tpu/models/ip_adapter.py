"""IP-Adapter(-plus) image-prompt conditioning in Flax.

The reference's RegionDrag baseline conditions SD-1.5 on the source image
through IP-Adapter-plus (RegionDrag/region_utils/cycle_sde.py:25-31,
drag.py:121-132): a perceiver "Resampler" compresses the CLIP vision
tower's penultimate hidden states into 16 image tokens, and every
cross-attention layer adds `scale * attn(q, k_ip, v_ip)` computed from
those tokens with per-layer projection weights.

Here the adapter is first-class UNet state instead of swapped attention
processors: `EditConfig.ip_scale > 0` creates `to_k_ip`/`to_v_ip` inside
every cross-attention layer and the image tokens thread through the UNet
as `context_image` (same path as the compose region prompts).

Checkpoint layout ("ip-adapter-plus_sd15.bin"): {"image_proj": resampler,
"ip_adapter": {"<2*i+1>.to_{k,v}_ip.weight": ...}} indexed in diffusers
`attn_processors` order — down blocks, then UP blocks, then mid (the
ModuleList registration quirk the adapter was trained against).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from freefine_tpu.models.layers import LayerNorm32


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """ip-adapter-plus_sd15 defaults."""

    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280     # CLIP ViT-H hidden size
    output_dim: int = 768         # SD-1.5 cross-attention dim
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        x = LayerNorm32(name="norm1")(x)
        latents = LayerNorm32(name="norm2")(latents)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_split(q), heads_split(k), heads_split(v)
        # the reference scales q and k by dim_head^-0.25 each
        # (resampler.py PerceiverAttention.forward)
        scale = 1.0 / np.sqrt(np.sqrt(self.dim_head))
        w = jnp.einsum(
            "bhqd,bhkd->bhqk",
            (qh * scale).astype(jnp.float32),
            (kh * scale).astype(jnp.float32),
        )
        w = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(vh.dtype), vh)
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class Resampler(nn.Module):
    """Perceiver resampler: CLIP penultimate tokens -> num_queries image
    tokens in the UNet's cross-attention dim."""

    config: ResamplerConfig = ResamplerConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = x.shape[0]
        latents = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / cfg.dim ** 0.5,
            (cfg.num_queries, cfg.dim),
        )
        lat = jnp.tile(latents[None], (b, 1, 1)).astype(cfg.dtype)
        h = nn.Dense(cfg.dim, dtype=cfg.dtype, name="proj_in")(x.astype(cfg.dtype))
        for i in range(cfg.depth):
            lat = lat + PerceiverAttention(
                cfg.dim, cfg.dim_head, cfg.heads, cfg.dtype,
                name=f"attn_{i}",
            )(h, lat)
            ff = LayerNorm32(name=f"ff_norm_{i}")(lat)
            ff = nn.Dense(cfg.dim * cfg.ff_mult, use_bias=False,
                          dtype=cfg.dtype, name=f"ff_in_{i}")(ff)
            ff = nn.gelu(ff, approximate=False)
            ff = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype,
                          name=f"ff_out_{i}")(ff)
            lat = lat + ff
        out = nn.Dense(cfg.output_dim, dtype=cfg.dtype, name="proj_out")(lat)
        return LayerNorm32(name="norm_out")(out)


def add_ip_adapter_params(pipe, rng=None) -> dict:
    """Return the pipeline's UNet params extended with freshly-initialised
    to_k_ip/to_v_ip kernels (so an adapter-enabled EditConfig can run before
    `convert_ip_adapter_unet` fills in real weights)."""
    import jax

    from flax import traverse_util

    from freefine_tpu.edit import EditConfig

    cfg = pipe.config
    ecfg = EditConfig(mode="none", method=None, local_cfg=False, ip_scale=1.0)
    sample = jnp.zeros(
        (1, cfg.latent_height, cfg.latent_width, cfg.unet.in_channels),
        cfg.unet.dtype,
    )
    ctx = jnp.zeros((1, 77, cfg.unet.cross_attention_dim), cfg.unet.dtype)
    tok = jnp.zeros((1, 16, cfg.unet.cross_attention_dim), cfg.unet.dtype)
    fresh = pipe.unet.init(
        rng if rng is not None else jax.random.key(0),
        sample, jnp.int32(1), ctx, edit_cfg=ecfg, context_image=tok,
    )
    base = dict(traverse_util.flatten_dict(
        pipe.params["unet"]["params"], sep="/"))
    for k, v in traverse_util.flatten_dict(
        fresh["params"], sep="/"
    ).items():
        if "to_k_ip" in k or "to_v_ip" in k:
            base[k] = v
    return {
        **pipe.params["unet"],
        "params": traverse_util.unflatten_dict(base, sep="/"),
    }


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------


def _resampler_map(depth: int) -> Dict[str, str]:
    """flax path -> torch state-dict key (IP-Adapter resampler.py names)."""
    m = {
        "latents": "latents",
        "proj_in/kernel": "proj_in.weight", "proj_in/bias": "proj_in.bias",
        "proj_out/kernel": "proj_out.weight", "proj_out/bias": "proj_out.bias",
        "norm_out/LayerNorm_0/scale": "norm_out.weight",
        "norm_out/LayerNorm_0/bias": "norm_out.bias",
    }
    for i in range(depth):
        a = f"layers.{i}.0"
        f = f"layers.{i}.1"
        m.update({
            f"attn_{i}/norm1/LayerNorm_0/scale": f"{a}.norm1.weight",
            f"attn_{i}/norm1/LayerNorm_0/bias": f"{a}.norm1.bias",
            f"attn_{i}/norm2/LayerNorm_0/scale": f"{a}.norm2.weight",
            f"attn_{i}/norm2/LayerNorm_0/bias": f"{a}.norm2.bias",
            f"attn_{i}/to_q/kernel": f"{a}.to_q.weight",
            f"attn_{i}/to_kv/kernel": f"{a}.to_kv.weight",
            f"attn_{i}/to_out/kernel": f"{a}.to_out.weight",
            f"ff_norm_{i}/LayerNorm_0/scale": f"{f}.0.weight",
            f"ff_norm_{i}/LayerNorm_0/bias": f"{f}.0.bias",
            f"ff_in_{i}/kernel": f"{f}.1.weight",
            f"ff_out_{i}/kernel": f"{f}.3.weight",
        })
    return m


def convert_resampler(flax_params: dict, sd: Dict[str, np.ndarray],
                      depth: int = 4) -> dict:
    """torch "image_proj" state dict -> flax Resampler params."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(flax_params["params"], sep="/")
    out = {}
    mapping = _resampler_map(depth)
    for fpath, arr in flat.items():
        tkey = mapping[fpath]
        t = np.asarray(sd[tkey])
        if fpath.endswith("kernel"):
            t = t.T
        if fpath == "latents" and t.ndim == 3:
            t = t[0]
        if t.shape != arr.shape:
            raise ValueError(f"{fpath}: {t.shape} vs {arr.shape}")
        out[fpath] = jnp.asarray(t, arr.dtype)
    return {"params": traverse_util.unflatten_dict(out, sep="/")}


def cross_attention_order(config) -> List[str]:
    """Cross-attn flax module paths in diffusers `attn_processors` order
    (down blocks, then up blocks, then mid) for an UNetConfig."""
    order = []
    n = len(config.block_out_channels)
    for i in range(n):
        if config.down_block_has_attn[i]:
            for j in range(config.layers_per_block):
                for d in range(config.transformer_depth[i]):
                    order.append(
                        f"down_blocks_{i}_attentions_{j}/transformer_blocks_{d}"
                    )
    for i in range(n):
        if config.up_block_has_attn[i]:
            level = n - 1 - i
            for j in range(config.layers_per_block + 1):
                for d in range(config.transformer_depth[level]):
                    order.append(
                        f"up_blocks_{i}_attentions_{j}/transformer_blocks_{d}"
                    )
    for d in range(config.transformer_depth[n - 1]):
        order.append(f"mid_block_attentions_0/transformer_blocks_{d}")
    return order


def convert_ip_adapter_unet(unet_params: dict, config,
                            sd: Dict[str, np.ndarray]) -> dict:
    """Fill to_k_ip/to_v_ip kernels from a torch "ip_adapter" state dict
    ({"<2*i+1>.to_k_ip.weight": ...}) into UNet params initialised with
    EditConfig.ip_scale > 0."""
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(unet_params["params"], sep="/"))
    for idx, path in enumerate(cross_attention_order(config)):
        for leaf in ("to_k_ip", "to_v_ip"):
            fkey = f"{path}/attn2/{leaf}/kernel"
            tkey = f"{2 * idx + 1}.{leaf}.weight"
            if fkey not in flat:
                raise KeyError(
                    f"{fkey} missing — init the UNet with ip_scale > 0"
                )
            t = np.asarray(sd[tkey]).T
            if t.shape != flat[fkey].shape:
                raise ValueError(f"{fkey}: {t.shape} vs {flat[fkey].shape}")
            flat[fkey] = jnp.asarray(t, flat[fkey].dtype)
    return {
        **unet_params,
        "params": traverse_util.unflatten_dict(flat, sep="/"),
    }
