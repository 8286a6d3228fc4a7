"""GeoBench baseline-method cores, rebuilt TPU-native.

The reference vendors ~120k LoC of 8 baseline editors under
/root/reference/evaluation/.  Rebuilding them verbatim is out of scope; the
*method cores* — the algorithmic ideas each baseline contributes — are
reimplemented here on the freefine_tpu stack:

  * DragonDiffusion's energy guidance lives in `freefine_tpu.ops.guidance`
    (feature-cosine losses differentiated through the jitted UNet).
  * RegionDrag (`region_drag`): cycle-SDE inversion + latent copy-paste +
    self-attention K/V replay, as two lax.scans over a 2-stream UNet batch.
  * SelfGuidance (`self_guidance`): cross-attention-map energy functions
    (shape/size/centroid/silhouette) differentiated w.r.t. latents.
  * DragDiffusion (`drag_diffusion`): per-image DreamBooth-LoRA fine-tuning
    (optax) + feature-supervised point dragging with point tracking.
"""

from freefine_tpu.baselines.design_edit import DesignEdit
from freefine_tpu.baselines.diffusion_handles import DiffusionHandles
from freefine_tpu.baselines.geo_diffuser import GeoDiffuser
from freefine_tpu.baselines.motion_guidance import MotionGuidance
from freefine_tpu.baselines.drag_diffusion import (
    DragDiffusion,
    init_lora,
    merge_lora,
    train_lora,
)
from freefine_tpu.baselines.region_drag import RegionDrag, region_pair_to_pts
from freefine_tpu.baselines.self_guidance import SelfGuidance

__all__ = [
    "DesignEdit", "DiffusionHandles", "DragDiffusion", "GeoDiffuser",
    "MotionGuidance", "RegionDrag", "SelfGuidance",
    "init_lora", "merge_lora", "train_lora", "region_pair_to_pts",
]
