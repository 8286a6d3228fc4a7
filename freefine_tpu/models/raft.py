"""RAFT optical flow in Flax (NHWC) — the MotionGuidance flow backbone.

Re-hosts the reference's in-tree RAFT (evaluation/MotionGuidance/
flow_models/raft/{raft,extractor,update}.py, basic variant): instance-norm
feature encoder + frozen-batch-norm context encoder (both output 256ch at
1/8 res), the all-pairs correlation pyramid (freefine_tpu.ops.flow — the
XLA replacement for the alt_cuda_corr CUDA extension), and the iterative
SepConvGRU update block with convex-combination 8x flow upsampling.

Inference-only: batch norms use converted running statistics, dropout off.
The iterative refinement is a lax.scan, fully differentiable — the
MotionGuidance baseline backpropagates its flow energy through the whole
network (losses.py:48-85).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from freefine_tpu.ops.flow import corr_lookup, corr_pyramid, correlation_volume


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 5          # flow_utils.RAFT wrapper default (flow_utils.py:12)
    dtype: jnp.dtype = jnp.float32


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d(affine=False): per-sample, per-channel
    normalisation over H, W; no parameters."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.epsilon)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d: converted running stats + affine."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.epsilon) * scale + bias


def _norm(norm_fn: str, features: int, name: str):
    if norm_fn == "instance":
        return InstanceNorm(name=name)
    if norm_fn == "batch":
        return FrozenBatchNorm(features, name=name)
    raise ValueError(norm_fn)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # explicit (1, 1) padding: torch's Conv2d(pad=1) at stride 2 differs
        # from flax 'SAME' (which pads asymmetrically)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_norm(self.norm_fn, self.planes, "norm1")(y))
        y = nn.Conv(self.planes, (3, 3), dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_norm(self.norm_fn, self.planes, "norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        padding="VALID", dtype=self.dtype,
                        name="downsample")(x)
            x = _norm(self.norm_fn, self.planes, "norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """extractor.BasicEncoder: 7x7/2 stem + 3 residual stages + 1x1 out
    (1/8 resolution)."""

    output_dim: int
    norm_fn: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_norm(self.norm_fn, 64, "norm1")(h))
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            h = ResidualBlock(dim, self.norm_fn, stride, self.dtype,
                              name=f"layer{i + 1}_0")(h)
            h = ResidualBlock(dim, self.norm_fn, 1, self.dtype,
                              name=f"layer{i + 1}_1")(h)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(h)


class BasicMotionEncoder(nn.Module):
    """update.BasicMotionEncoder."""

    corr_planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=[(3, 3), (3, 3)],
                            dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), dtype=self.dtype, name="convf2")(f))
        out = nn.relu(nn.Conv(128 - 2, (3, 3), dtype=self.dtype, name="conv")(
            jnp.concatenate([c, f], -1)
        ))
        return jnp.concatenate([out, flow], -1)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for suffix, kern, pad in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            hx = jnp.concatenate([h, x], -1)
            padding = [(pad[0], pad[0]), (pad[1], pad[1])]
            z = jax.nn.sigmoid(nn.Conv(
                self.hidden_dim, kern, padding=padding, dtype=self.dtype,
                name=f"convz{suffix}")(hx))
            r = jax.nn.sigmoid(nn.Conv(
                self.hidden_dim, kern, padding=padding, dtype=self.dtype,
                name=f"convr{suffix}")(hx))
            q = jnp.tanh(nn.Conv(
                self.hidden_dim, kern, padding=padding, dtype=self.dtype,
                name=f"convq{suffix}")(jnp.concatenate([r * h, x], -1)))
            h = (1 - z) * h + z * q
        return h


class BasicUpdateBlock(nn.Module):
    config: RAFTConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        cfg = self.config
        corr_planes = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
        motion = BasicMotionEncoder(corr_planes, cfg.dtype, name="encoder")(
            flow, corr
        )
        x = jnp.concatenate([inp, motion], -1)
        net = SepConvGRU(cfg.hidden_dim, cfg.dtype, name="gru")(net, x)
        f = nn.relu(nn.Conv(256, (3, 3), dtype=cfg.dtype,
                            name="flow_head_conv1")(net))
        delta = nn.Conv(2, (3, 3), dtype=cfg.dtype, name="flow_head_conv2")(f)
        m = nn.relu(nn.Conv(256, (3, 3), dtype=cfg.dtype, name="mask_0")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=cfg.dtype, name="mask_2")(m)
        return net, mask, delta


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling (raft.py:114-127).

    flow [B, H, W, 2] at 1/8 res, mask [B, H, W, 64*9] -> [B, 8H, 8W, 2].
    """
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 9 shifted neighbour copies (the 3x3 unfold)
    neigh = jnp.stack(
        [fp[:, dy : dy + h, dx : dx + w, :] for dy in range(3)
         for dx in range(3)],
        axis=3,
    )  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, neigh)  # [B, H, W, 8, 8, 2]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """images [B, H, W, 3] in [0, 1] -> flow [B, H, W, 2] (x, y) pixels."""

    config: RAFTConfig = RAFTConfig()

    @nn.compact
    def __call__(self, image1, image2, iters: int = 0):
        cfg = self.config
        iters = iters or cfg.iters
        x1 = 2.0 * image1 - 1.0
        x2 = 2.0 * image2 - 1.0

        f = BasicEncoder(256, "instance", cfg.dtype, name="fnet")
        fmap1 = f(x1)
        fmap2 = f(x2)
        pyr = corr_pyramid(
            correlation_volume(fmap1, fmap2), cfg.corr_levels
        )

        cnet = BasicEncoder(
            cfg.hidden_dim + cfg.context_dim, "batch", cfg.dtype, name="cnet"
        )(x1)
        net = jnp.tanh(cnet[..., : cfg.hidden_dim])
        inp = nn.relu(cnet[..., cfg.hidden_dim:])

        b, h, w, _ = fmap1.shape
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32), indexing="ij",
        )
        coords0 = jnp.broadcast_to(
            jnp.stack([xs, ys], -1)[None], (b, h, w, 2)
        )
        coords1 = coords0

        update = BasicUpdateBlock(cfg, name="update_block")
        flow_up = None
        for _ in range(iters):
            corr = corr_lookup(pyr, coords1, cfg.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta = update(net, inp, corr, flow)
            coords1 = coords1 + delta
            flow_up = upsample_flow_convex(coords1 - coords0, up_mask)
        return flow_up


# ---------------------------------------------------------------------------
# Weight conversion (raft-things.pth layout, "module."-prefixed)
# ---------------------------------------------------------------------------

_BN = {"scale": "weight", "bias": "bias", "mean": "running_mean",
       "var": "running_var"}


def convert_raft(flax_params: dict, sd: Dict[str, np.ndarray]) -> dict:
    """torch RAFT state dict -> flax params, tree-driven with shape checks."""
    from flax import traverse_util

    def strip(k):
        return k[len("module."):] if k.startswith("module.") else k

    sd = {strip(k): np.asarray(v) for k, v in sd.items()}
    flat = traverse_util.flatten_dict(flax_params["params"], sep="/")
    out = {}
    for path, arr in flat.items():
        t_key = _torch_key(path)
        t = sd[t_key]
        if path.endswith("/kernel"):
            t = t.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if t.shape != arr.shape:
            raise ValueError(f"{path}: {t.shape} vs {arr.shape}")
        out[path] = jnp.asarray(t, arr.dtype)
    return {"params": traverse_util.unflatten_dict(out, sep="/")}


def _torch_key(path: str) -> str:
    """flax param path -> torch state-dict key."""
    parts = path.split("/")
    leaf = parts[-1]
    mods = parts[:-1]

    t = []
    for m in mods:
        if m.startswith("layer") and "_" in m:
            stage, idx = m[len("layer"):].split("_")
            t.append(f"layer{stage}.{idx}")
        elif m == "flow_head_conv1":
            t.append("flow_head.conv1")
        elif m == "flow_head_conv2":
            t.append("flow_head.conv2")
        elif m == "mask_0":
            t.append("mask.0")
        elif m == "mask_2":
            t.append("mask.2")
        elif m == "downsample":
            t.append("downsample.0")
        elif m == "norm3":
            t.append("downsample.1")
        else:
            t.append(m)
    base = ".".join(t)
    if leaf == "kernel":
        return base + ".weight"
    if leaf in _BN:
        return base + "." + _BN[leaf]
    return base + "." + leaf
