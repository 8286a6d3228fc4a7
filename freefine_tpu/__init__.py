"""FreeFine-TPU: a TPU-native, training-free geometric image editing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of FreeFine
(ICCV 2025, "Training-Free Diffusion for Geometric Image Editing";
reference implementation: CIawevy/FreeFine).

The framework performs training-free diffusion editing with a single unified
pipeline: object repositioning / reorientation / reshaping (2D affine and
depth-based 3D), fine-grained partial editing, structure completion, object
removal, appearance transfer and multi-image composition.

Architecture (TPU-first, not a port):
  - All compute-path code is pure-functional JAX, jitted end-to-end: DDIM
    inversion + regeneration run as single `lax.scan` loops over steps.
  - Attention editing (TCA / MMSA / SSA / SDSA / local CFG) is a first-class
    input to the UNet (an `EditState` pytree), not runtime monkey-patching.
  - Masked attention uses rank-1 structured biases (per-key FG vectors +
    per-query selectors) instead of the O(L^2) dense masks of the reference,
    and fuses the FG/BG double-attention into one Pallas flash-attention
    kernel on TPU.
  - Multi-chip scaling uses `jax.sharding.Mesh` + ICI collectives.
"""

__version__ = "0.1.0"

from freefine_tpu.config import (  # noqa: F401
    CLIPTextConfig,
    PipelineConfig,
    UNetConfig,
    VAEConfig,
)
