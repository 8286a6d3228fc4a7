"""Static configuration dataclasses for the FreeFine-TPU framework.

The reference scatters configuration across hard-coded paths, argparse and
OmegaConf YAML (SURVEY.md §5).  Here everything is a frozen dataclass so that
configs are hashable and can be used as static arguments to `jax.jit`.

Defaults reproduce Stable Diffusion v1.5 (the reference backbone,
/root/reference/src/demo/model.py:94) in bfloat16 for the TPU MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD UNet2DCondition architecture description.

    The default values are the SD-1.5 architecture the reference pipeline
    loads via diffusers `StableDiffusionPipeline.from_pretrained`.
    """

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # attention head *count* per block resolution; SD-1.5 uses 8 heads at
    # every attention layer (head_dim = channels / 8).
    num_attention_heads: int = 8
    # Per-level head derivation (diffusers' SDXL/SD-2.x convention): when
    # set, a level's head count is block_out_channels[level] // head_dim
    # (SDXL: 64 -> heads (5, 10, 20)); when None, num_attention_heads is
    # used at every level.  Weight shapes are identical either way — only
    # the softmax head partitioning differs — so this is invisible to the
    # key/shape manifests and MUST be set correctly per architecture.
    head_dim: Optional[int] = None
    # Dense (True) vs 1x1-conv (False) transformer proj_in/proj_out
    # (diffusers use_linear_projection; True for SDXL and SD-2.x).
    use_linear_projection: bool = False
    cross_attention_dim: int = 768
    # Which down blocks carry cross/self attention (SD-1.5: first three).
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    # Transformer blocks per spatial transformer, per resolution level
    # (SD-1.5: 1 everywhere; SDXL: (1, 2, 10)).
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 1)
    # SDXL-style added conditioning: projected (text_embeds ++ time_ids)
    # vector folded into the timestep embedding; None disables.
    addition_embed_dim: int | None = None
    norm_num_groups: int = 32
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_transformer_blocks(self) -> int:
        """Total spatial-transformer blocks == the reference's 16 for SD-1.5.

        The reference indexes them 0..15 via `cur_att_layer // 2`
        (src/utils/attention.py:1051) in registration order down, mid, up.
        """
        n = 0
        for has, _ in zip(self.down_block_has_attn, self.block_out_channels):
            if has:
                n += self.layers_per_block
        n += 1  # mid block
        for has, _ in zip(self.up_block_has_attn, self.block_out_channels):
            if has:
                n += self.layers_per_block + 1
        return n

    @property
    def attn_layer_layout(self) -> Tuple[int, int]:
        """(total, up_start) in depth-weighted attention-layer indices —
        the numbering `UNet2DCondition` assigns via ``block_index`` (each
        SpatialTransformer advances the counter by its transformer depth).

        For SD-1.5 (depth 1 everywhere) this equals the module count: 16
        total, decoder at 7..15 — the reference's `cur_att_layer // 2`
        indexing (src/utils/attention.py:1051).  Deep-transformer backbones
        (SDXL: depths (1, 2, 10) -> 70 layers, decoder at 34..69) need the
        TCA layer range rescaled to THIS layout; `FreeFine._edit_config`
        maps the reference's 10-of-16 start to the same decoder fraction.
        """
        nb = len(self.block_out_channels)
        down = sum(
            self.transformer_depth[i] * self.layers_per_block
            for i in range(nb)
            if self.down_block_has_attn[i]
        )
        mid = self.transformer_depth[nb - 1]
        up = sum(
            self.transformer_depth[nb - 1 - i] * (self.layers_per_block + 1)
            for i in range(nb)
            if self.up_block_has_attn[i]
        )
        return down + mid + up, down + mid


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL (SD VAE) architecture description."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215  # reference model.py:268 (`* 0.18215`)
    dtype: jnp.dtype = jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP ViT-L/14 text encoder (SD-1.5 conditioning model)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # MLP activation: "quick_gelu" (OpenAI CLIP / SD-1.5) or "gelu"
    # (the OpenCLIP-derived SD-2.x text tower).
    activation: str = "quick_gelu"
    dtype: jnp.dtype = jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """DDIM schedule hyper-parameters.

    Matches diffusers `DDIMScheduler.from_config` of the SD-1.5 scheduler
    (reference model.py:95): scaled_linear betas 0.00085..0.012 over 1000
    train steps, leading timestep spacing with steps_offset=1, and
    set_alpha_to_one=False (final_alpha_cumprod = alphas_cumprod[0]).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    steps_offset: int = 1
    set_alpha_to_one: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level pipeline configuration."""

    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    height: int = 512
    width: int = 512
    # SDXL dual-encoder: an OpenCLIPTextConfig for text_encoder_2 (None for
    # single-encoder SD-1.5 pipelines).
    text2: Optional[object] = None

    @property
    def latent_height(self) -> int:
        return self.height // 8

    @property
    def latent_width(self) -> int:
        return self.width // 8


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """PixArt-α-class latent diffusion transformer (models/dit.py).

    The reference README's planned backbone swap ("SDXL/DiT"); defaults are
    the PixArt-XL-2 geometry (hidden 1152, depth 28, 16 heads of 72, patch 2
    on the 64² SD latent grid → 1024 tokens).
    """

    sample_size: int = 64
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    cross_attention_dim: int = 768
    # PixArt checkpoints predict [eps; sigma] (out 2*C); the forward returns
    # the eps half, as the diffusers PixArt pipeline chunks it.
    learn_sigma: bool = False
    dtype: jnp.dtype = jnp.bfloat16


def pixart_xl2_dit_config(
    sample_size: int = 64, dtype: Optional[jnp.dtype] = None
) -> DiTConfig:
    """The published PixArt-XL-2 transformer geometry
    (PixArt-alpha/PixArt-XL-2-512x512): depth 28, hidden 1152, 16 heads of
    72, patch 2, T5-XXL 4096-d captions.  Checkpoint-loadable via
    `weights.convert_pixart_transformer` (manifest
    tests/fixtures/pixart_xl2_keys.txt)."""
    return DiTConfig(
        sample_size=sample_size,
        cross_attention_dim=4096,
        learn_sigma=True,
        dtype=dtype or jnp.bfloat16,
    )


def pixart_pipeline_config(
    height: int = 512, width: int = 512, dtype: Optional[jnp.dtype] = None
) -> PipelineConfig:
    """The checkpoint-complete PixArt-α-512 editing pipeline: the published
    PixArt-XL-2 transformer (weights.convert_pixart_transformer), the SD
    VAE, and the T5 v1.1 XXL caption tower (weights.convert_t5_encoder;
    torch-parity-tested).  Load via `weights.load_pixart`."""
    from freefine_tpu.models.t5 import T5Config

    if height != width:
        raise ValueError(
            f"the DiT backbone is square-only; got {height}x{width}"
        )
    dtype = dtype or jnp.bfloat16
    return PipelineConfig(
        unet=pixart_xl2_dit_config(sample_size=height // 8, dtype=dtype),
        vae=VAEConfig(dtype=dtype),
        text=T5Config(dtype=dtype),
        height=height,
        width=width,
    )


def tiny_dit_config() -> DiTConfig:
    """Miniature DiT for CPU unit tests: patch 1 on the tiny 8² latent grid
    keeps the token count at 64 = the tiny mask pyramid's top level, so the
    editing masks resolve exactly as they do for the tiny UNet."""
    return DiTConfig(
        sample_size=8,
        patch_size=1,
        hidden_size=32,
        depth=4,
        num_heads=2,
        cross_attention_dim=32,
        dtype=jnp.float32,
    )


def dit_pipeline_config(
    height: int = 512, width: int = 512, dtype: Optional[jnp.dtype] = None
) -> PipelineConfig:
    """SD-1.5 VAE/CLIP with the DiT backbone (PixArt-XL geometry at the
    CLIP 768-d context) — the reference README's backbone-swap TODO."""
    if height != width:
        raise ValueError(
            "the DiT backbone is square-only (DiTConfig carries one "
            f"sample_size and a square sincos position table); got "
            f"{height}x{width}"
        )
    dtype = dtype or jnp.bfloat16
    return PipelineConfig(
        unet=DiTConfig(sample_size=height // 8, dtype=dtype),
        vae=VAEConfig(dtype=dtype),
        text=CLIPTextConfig(dtype=dtype),
        height=height,
        width=width,
    )


def tiny_dit_pipeline_config(height: int = 64, width: int = 64) -> PipelineConfig:
    """tiny_pipeline_config with the DiT backbone for CPU tests."""
    base = tiny_pipeline_config(height, width)
    return dataclasses.replace(base, unet=tiny_dit_config())


def tiny_pixart_pipeline_config(height: int = 64, width: int = 64) -> PipelineConfig:
    """Miniature PixArt-layout pipeline for CPU tests: tiny DiT with
    learned sigma + tiny T5 caption tower (the pixart_pipeline_config
    structure at unit-test scale)."""
    from freefine_tpu.models.t5 import tiny_t5_config

    base = tiny_pipeline_config(height, width)
    t5 = tiny_t5_config()
    return dataclasses.replace(
        base,
        unet=dataclasses.replace(
            tiny_dit_config(),
            learn_sigma=True,
            cross_attention_dim=t5.d_model,
        ),
        text=t5,
    )


def tiny_pipeline_config(height: int = 64, width: int = 64) -> PipelineConfig:
    """A miniature config for CPU unit tests (seconds, not minutes).

    Preserves the structural invariants that matter for edit-state routing:
    four block resolutions, the same attn-bearing block pattern, and 16
    transformer blocks — so layer indices 10..15 land in the same up blocks
    as SD-1.5.
    """
    unet = UNetConfig(
        sample_size=height // 8,
        block_out_channels=(32, 64, 128, 128),
        num_attention_heads=2,
        cross_attention_dim=32,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    vae = VAEConfig(
        block_out_channels=(16, 16, 32, 32),
        layers_per_block=1,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    text = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
        dtype=jnp.float32,
    )
    return PipelineConfig(unet=unet, vae=vae, text=text, height=height, width=width)


def sdxl_unet_config(dtype=None) -> UNetConfig:
    """SDXL-base UNet shape (the reference's planned backbone swap,
    README TODO): 3 levels, transformer depths (1, 2, 10), 2048-d context,
    added text/time conditioning (2816-d input)."""
    return UNetConfig(
        sample_size=128,
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        head_dim=64,  # per-level heads (5, 10, 20) — diffusers SDXL config
        cross_attention_dim=2048,
        down_block_has_attn=(False, True, True),
        up_block_has_attn=(True, True, False),
        transformer_depth=(1, 2, 10),
        addition_embed_dim=2816,
        use_linear_projection=True,
        dtype=dtype or jnp.bfloat16,
    )


def sdxl_pipeline_config(
    height: int = 1024, width: int = 1024, dtype: Optional[jnp.dtype] = None
) -> PipelineConfig:
    """The full SDXL-base pipeline: SDXL UNet (2048-d context + added
    conditioning), the SDXL VAE (scaling 0.13025), CLIP-L penultimate
    encoder, and the OpenCLIP-bigG second tower.

    The reference names this backbone swap as its scaling TODO (README:77);
    topology matches evaluation/DesignEdit/utils/sdxl.py.
    """
    from freefine_tpu.models.open_clip_text import open_clip_text_bigg

    dtype = dtype or jnp.bfloat16
    return PipelineConfig(
        unet=sdxl_unet_config(dtype=dtype),
        vae=VAEConfig(scaling_factor=0.13025, dtype=dtype),
        text=CLIPTextConfig(dtype=dtype),
        text2=open_clip_text_bigg(dtype=dtype),
        height=height,
        width=width,
    )


def tiny_sdxl_pipeline_config(height: int = 64, width: int = 64) -> PipelineConfig:
    """Miniature SDXL topology for CPU tests: 3 levels, mixed transformer
    depths, dual encoders, added conditioning."""
    from freefine_tpu.models.open_clip_text import OpenCLIPTextConfig

    unet = UNetConfig(
        sample_size=height // 8,
        block_out_channels=(32, 64, 128),
        num_attention_heads=2,
        cross_attention_dim=48,  # 16 (CLIP tiny) + 32 (OpenCLIP tiny)
        down_block_has_attn=(False, True, True),
        up_block_has_attn=(True, True, False),
        transformer_depth=(1, 2, 2),
        addition_embed_dim=32 + 6 * 256,
        use_linear_projection=True,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    vae = VAEConfig(
        block_out_channels=(16, 16, 32, 32),
        layers_per_block=1,
        norm_num_groups=8,
        scaling_factor=0.13025,
        dtype=jnp.float32,
    )
    text = CLIPTextConfig(
        vocab_size=1000, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2, dtype=jnp.float32,
    )
    text2 = OpenCLIPTextConfig(
        vocab_size=1000, width=32, heads=2, layers=2,
        projection_dim=32, dtype=jnp.float32,
    )
    return PipelineConfig(
        unet=unet, vae=vae, text=text, text2=text2, height=height, width=width
    )


def sd21_pipeline_config(
    height: int = 768, width: int = 768, dtype: Optional[jnp.dtype] = None
) -> PipelineConfig:
    """Stable Diffusion 2.1 (stabilityai/stable-diffusion-2-1) — the DIFT
    featurizer backbone of the reference's MD metric
    (evaluation/metrics/MD/dift_sd.py loads SD-2.1; mean_distance.py:132).

    Same block layout as SD-1.5 but: 1024-d cross-attention (OpenCLIP-H
    derived 23-layer gelu text tower), head_dim=64 per-level heads
    (5, 10, 20, 20), and linear transformer projections."""
    dtype = dtype or jnp.bfloat16
    return PipelineConfig(
        unet=UNetConfig(
            sample_size=height // 8,
            cross_attention_dim=1024,
            head_dim=64,
            use_linear_projection=True,
            dtype=dtype,
        ),
        vae=VAEConfig(dtype=dtype),
        text=CLIPTextConfig(
            hidden_size=1024,
            intermediate_size=4096,
            num_layers=23,
            num_heads=16,
            activation="gelu",
            dtype=dtype,
        ),
        height=height,
        width=width,
    )


def sd15_pipeline_config(
    height: int = 512, width: int = 512, dtype: Optional[jnp.dtype] = None
) -> PipelineConfig:
    """The production SD-1.5 configuration (bf16 by default)."""
    dtype = dtype or jnp.bfloat16
    return PipelineConfig(
        unet=UNetConfig(dtype=dtype),
        vae=VAEConfig(dtype=dtype),
        text=CLIPTextConfig(dtype=dtype),
        height=height,
        width=width,
    )
