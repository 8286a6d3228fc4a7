"""SD AutoencoderKL (VAE) in Flax, NHWC, TPU-native.

Provides the image<->latent bridge of the reference pipeline
(`image2latent`/`latent2image`, /root/reference/src/demo/model.py:223-286):
encode maps [-1,1] RGB to 4-channel latents scaled by 0.18215; decode inverts.

Architecture matches diffusers AutoencoderKL for SD-1.5 (the model the
reference loads via `StableDiffusionPipeline.from_pretrained`,
src/demo/model.py:94).  Convolutions are channels-last for the TPU MXU; all
GroupNorms accumulate in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from freefine_tpu.config import VAEConfig
from freefine_tpu.models.layers import GroupNorm32


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(self.norm_num_groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(self.norm_num_groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head full self-attention block used at the VAE bottleneck."""

    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm32(self.norm_num_groups, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y).astype(jnp.float32)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y).astype(jnp.float32)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y).astype(jnp.float32)
        # Route through the shared dispatcher: Pallas flash on TPU (O(S)
        # memory — the dense [B, S, S] logits at a 128x128 bottleneck
        # (1024^2 inputs, S=16384) are ~1 GB f32 per image and OOM the
        # encode), einsum elsewhere; numerically equivalent (golden-tested).
        from freefine_tpu.ops.attention import masked_sdpa

        out = masked_sdpa(q, k, v, 1).astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return residual + out.reshape(b, h, w, c)


class VAEDownsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # diffusers pads asymmetrically (0,1) before the stride-2 conv.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class VAEUpsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = cfg.dtype
        x = x.astype(dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), dtype=dtype, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(
                    out_ch, cfg.norm_num_groups, dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(h)
            if i < n - 1:
                h = VAEDownsample(out_ch, dtype, name=f"down_blocks_{i}_downsamplers_0")(h)
        mid = cfg.block_out_channels[-1]
        h = VAEResnetBlock(mid, cfg.norm_num_groups, dtype, name="mid_resnets_0")(h)
        h = VAEAttention(cfg.norm_num_groups, dtype, name="mid_attentions_0")(h)
        h = VAEResnetBlock(mid, cfg.norm_num_groups, dtype, name="mid_resnets_1")(h)
        h = GroupNorm32(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        # 2x latent channels: mean and logvar of the diagonal gaussian.
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), dtype=dtype, name="conv_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=dtype, name="quant_conv")(h)
        return h


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dtype = cfg.dtype
        z = z.astype(dtype)
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=dtype, name="post_quant_conv")(z)
        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), dtype=dtype, name="conv_in")(z)
        mid = rev[0]
        h = VAEResnetBlock(mid, cfg.norm_num_groups, dtype, name="mid_resnets_0")(h)
        h = VAEAttention(cfg.norm_num_groups, dtype, name="mid_attentions_0")(h)
        h = VAEResnetBlock(mid, cfg.norm_num_groups, dtype, name="mid_resnets_1")(h)
        n = len(rev)
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(
                    out_ch, cfg.norm_num_groups, dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(h)
            if i < n - 1:
                h = VAEUpsample(out_ch, dtype, name=f"up_blocks_{i}_upsamplers_0")(h)
        h = GroupNorm32(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), dtype=dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    """Encoder + decoder pair with the SD latent scaling convention.

    encode(): deterministic (mode of the posterior) by default — the
    reference's `image2latent` also takes the mean path for inversion
    (model.py:251 uses sample() only in 'train' mode; editing uses the
    deterministic branch).
    """

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")

    def __call__(self, x):  # for init
        z = self.encode(x)
        return self.decode(z)

    def encode(self, x, rng=None) -> jnp.ndarray:
        """[-1,1] RGB [B,H,W,3] -> scaled latents [B,H/8,W/8,4]."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + std.astype(mean.dtype) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        return mean * self.config.scaling_factor

    def decode(self, z) -> jnp.ndarray:
        """Scaled latents -> [-1,1] RGB."""
        return self.decoder(z / self.config.scaling_factor)


def to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float image -> uint8, matching reference latent2image
    (model.py:269-280: (x/2+0.5).clamp(0,1) * 255)."""
    x = jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    return (x * 255.0).round().astype(jnp.uint8)


def from_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 HWC/BHWC -> [-1,1] float32 (reference preprocess_image)."""
    x = img.astype(jnp.float32) / 127.5 - 1.0
    if x.ndim == 3:
        x = x[None]
    return x
