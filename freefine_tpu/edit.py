"""Editing state: the functional replacement for the reference's attention controller.

The reference (CIawevy/FreeFine) drives all editing behaviour through a mutable
`Attention_Modulator` object monkey-patched into every attention layer
(`src/utils/attention.py:342-452,640`).  Here the same behaviour is split into

  * ``EditConfig``  — static, hashable configuration (mode, method, scopes,
    layer gating).  Part of the jit cache key, so each editing mode compiles to
    its own fused XLA graph with zero runtime branching.
  * ``EditState``   — a pytree of traced arrays (mask pyramids, per-step
    scalars).  Threaded through the UNet like any other input, so one compiled
    graph serves every case/mask/step.

Mask pyramids replace the reference's per-layer `F.interpolate` +
`seq x seq` dense mask materialisation (`attention.py:862-951`): masks are
downsampled once per call to each attention resolution and kept as flat
per-token vectors; attention ops consume them as rank-1 additive biases.

Stream layouts (matching the reference batch conventions):
  * edit / bggen : ``[uncond_edit, uncond_ref, cond_edit, cond_ref]``
    (model.py:594 — `cat([latents] * 2)` of the 2-stream `[edit, ref]`).
  * compose      : ``[edit, ref_1 .. ref_N, cond_edit]`` (model.py:407).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


# Transformer-block indices in *execution order* for SD-1.5: down blocks get
# 0..5, mid 6, up 7..15 (reference counts attention calls at runtime,
# `cur_att_layer // 2`, attention.py:1051).  The default TCA gate is blocks
# 10..15 — the 32^2 and 64^2 decoder blocks (`start_layer=10`, model.py:506).
SD15_NUM_BLOCKS = 16
DEFAULT_LAYER_RANGE = (10, 16)


@dataclasses.dataclass(frozen=True)
class EditConfig:
    """Static editing configuration (hashable; safe as a jit static arg).

    mode:
      'none'    — vanilla sampling, no interception.
      'edit'    — geometric edit regeneration (reference forward_sampling,
                  model.py:476).
      'bggen'   — background generation / object removal
                  (forward_sampling_background_gen, model.py:656).
      'compose' — N-image composition / appearance transfer
                  (forward_sampling_compose, model.py:301).
      'drag'    — RegionDrag-style K/V paste: stream 0 (the edited latent)
                  runs every self-attention layer with stream 1's (the
                  cycle-consistent hook latent's) K/V.  The functional
                  equivalent of RegionDrag's to_k/to_v record-then-paste
                  forward hooks (evaluation/RegionDrag/region_utils/
                  drag.py:195-215) — instead of storing K/V for all layers
                  and steps, the hook latent rides along as a second batch
                  stream and its K/V are gathered in place.

    method:
      'tca'  — masked reference attention blended with self-attention by the
               per-step context_guidance scalar (attention.py:1070-1083).
      'mmsa' — masked reference attention only (mmsa_es uses the same graph
               with the per-step share_gate dropping to 0 after end_step).
      'ssa'  — StyleAligned shared attention: ref K/V appended (seq -> 2*seq)
               (attention.py:1142-1192).
      'sdsa' — ssa + FG mask restricting the appended reference keys
               (prepare_sdsa_mask, attention.py:940-951).
    """

    mode: str = "none"
    method: Optional[str] = None
    local_cfg: bool = True          # reference `local_edit` (cross-attn scope)
    layer_range: Tuple[int, int] = DEFAULT_LAYER_RANGE
    tca_scope: Tuple[str, ...] = ("up",)
    style_align_scope: Tuple[str, ...] = ("down", "mid", "up")
    num_streams: int = 4            # UNet batch (4 edit/bggen; N+2 compose)
    num_sources: int = 0            # compose: N reference images
    prompt_length: int = 0          # compose: region prompts incl. trailing ""
    # Debug instrument: sow head-averaged attention maps (<= 32x32 queries)
    # into flax "intermediates" — the reference's AttentionStore
    # (attention.py:565-638).  Off in the hot path.
    store_attention: bool = False
    # drag mode: the batch stream whose K/V every stream attends with
    # (RegionDrag: 1 = the hook latent; DragDiffusion/MasaCtrl: 0 = the
    # un-dragged branch).
    kv_source_stream: int = 1
    # IP-Adapter image-prompt strength: > 0 creates to_k_ip/to_v_ip in every
    # cross-attn layer and adds ip_scale * attn(q, k_ip, v_ip) over the
    # `context_image` tokens (RegionDrag loads ip-adapter-plus at 0.5,
    # region_utils/cycle_sde.py:25-31).
    ip_scale: float = 0.0
    # SelfGuidance instrument: sow per-token cross-attention maps (selected
    # by EditState.token_select) and the up_blocks[-1].resnets[-2] feature
    # tap, both differentiable — the functional form of the reference
    # baseline's CustomAttnProcessor storage + module Hook
    # (evaluation/SelfGuidance/free_guidance.py:384-405,595-599).
    sow_token_attn: bool = False
    # geodiff: sequence-length gate for the sown losses — losses at
    # seq >= geodiff_loss_seq, the removal (attention-correlation) loss at
    # exactly that seq (the reference's hw >= 32^2 gate,
    # attention_processors.py:462).
    geodiff_loss_seq: int = 1024
    # Shared-reference layout: the UNet batch is the 2-stream [u_e, c_e]
    # per case and the reference stream's K/V arrive pre-computed in
    # EditState.ref_kv (captured once per step from a standalone reference
    # pass and shared by every case of the same source image).  The capture
    # pass runs the reference stream with vanilla self-attention, so this
    # lane implies ref_vanilla semantics (see below); it is exact vs a
    # per-case loop run with ref_vanilla=True
    # (pipeline.sample_edit_loop_shared, tests/test_shared_ref.py).
    shared_ref: bool = False
    # Reference-stream semantics.  The reference's attention masks are built
    # per-stream but consumed per (batch*head) row through torch's tiling
    # `.repeat(heads, ...)` (the classic diffusers repeat-vs-
    # repeat_interleave mask bug, attention.py:856-897): with the 4-row
    # [m, 1, m, 1] pattern and an even head count the effective mask is
    # *head parity* — even heads take the masked/modulated path and odd
    # heads unmasked reference-key attention, in EVERY stream including the
    # reference streams (whose "reference keys" are their own, so they run
    # a masked self-modulation on even heads).  Default False replicates
    # that behaviour bit-for-bit (tests/test_reference_golden.py).
    # ref_vanilla=True is the *intent* variant — reference streams stay
    # vanilla — required by the shared-source lane (whose capture pass is a
    # standalone vanilla reference pass) and available as a documented
    # deviation.  Edit streams keep head-parity masking either way.
    ref_vanilla: bool = False
    # Capture mode for the standalone reference pass: sow each TCA-scope
    # self-attention layer's (k, v) into flax "intermediates" so the edit
    # streams can consume them via EditState.ref_kv.
    store_kv: bool = False

    def __post_init__(self):
        # 'design' = DesignEdit-style key-input masking: the background
        # stream (index kv_source_stream) computes its self-attention KEYS
        # from hidden states zeroed inside the removal region (queries and
        # values untouched), softly excluding the hole from its own context
        # (DesignEdit/src/demo/model.py:374-396).  Gated per step by
        # EditState.share_gate; the region is EditState.local_region
        # (1 = keep).
        # 'geodiff' = GeoDiffuser attention sharing/optimization: the edit
        # stream's attention output is rebuilt from geometrically warped
        # base-stream queries against base K/V, with preservation/placement/
        # removal losses sown for latent optimization (GeoDiffuser/utils/
        # attention_processors.py:377-740).  Uses EditState.warp_coords +
        # fg_ref (object) + fg_retain (warped object) pyramids.
        assert self.mode in (
            "none", "edit", "bggen", "compose", "drag", "design", "geodiff"
        ), self.mode
        assert self.method in (None, "tca", "mmsa", "ssa", "sdsa"), self.method

    @property
    def uses_share_attention(self) -> bool:
        return self.method in ("ssa", "sdsa")

    @property
    def uses_tca(self) -> bool:
        return self.method in ("tca", "mmsa")

    def block_gated(self, block_index: int) -> bool:
        """Static layer gate (reference `cur_att_layer // 2 in layer_idx`)."""
        lo, hi = self.layer_range
        return lo <= block_index < hi


def none_config() -> EditConfig:
    return EditConfig(mode="none", method=None, local_cfg=False)


@struct.dataclass
class EditState:
    """Traced editing state threaded through the UNet.

    Mask pyramids are dicts keyed by static sequence length (= attn tokens at
    that resolution).  All masks are flat ``[S]`` float32 vectors in [0, 1]
    (or ``[N, S]`` for the compose stacks).

    fg_retain : target-region mask (reference `fg_retain_mask`) — selects
                which queries take FG-attention output; also the local
                cross-attn region (`local_edit_region`).
    fg_ref    : source-object mask (reference `fg_ref_mask`) — selects which
                reference keys count as foreground.
    src_masks : compose [N, S] per-source key masks.
    tgt_masks : compose [N+1, S] per-region query masks (last = background).
    context_guidance : per-step TCA blend scalar (model.py:438-455).
    share_gate : per-step 0/1 — multiplies the whole modulation; replaces the
                 reference's `use_tca = False` flip for 'mmsa_es'
                 (model.py:589-591) without retracing.
    """

    fg_retain: Dict[int, jnp.ndarray] = struct.field(default_factory=dict)
    fg_ref: Dict[int, jnp.ndarray] = struct.field(default_factory=dict)
    local_region: Dict[int, jnp.ndarray] = struct.field(default_factory=dict)
    src_masks: Dict[int, jnp.ndarray] = struct.field(default_factory=dict)
    tgt_masks: Dict[int, jnp.ndarray] = struct.field(default_factory=dict)
    context_guidance: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.float32)
    )
    share_gate: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.ones((), jnp.float32)
    )
    # SelfGuidance: [T_sel, 77] token-selection matrix (one-hot rows, zero
    # rows = padding) reducing sown cross-attn maps to the edited object's
    # tokens.  None unless EditConfig.sow_token_attn.
    token_select: Optional[jnp.ndarray] = None
    # GeoDiffuser: per-resolution inverse-warp grids {seq: [h, w, 2]} of
    # absolute (y, x) source coordinates — sampling base-stream query maps
    # at these positions applies the geometric edit.  None unless
    # EditConfig.mode == 'geodiff'.
    warp_coords: Optional[Dict[int, jnp.ndarray]] = None
    # Shared-reference layout (EditConfig.shared_ref): {block_index: (k, v)}
    # with k/v [S, E] — the reference stream's self-attention K/V at each
    # TCA-gated layer, captured once per step (EditConfig.store_kv) and
    # shared across all cases of the same source image.
    ref_kv: Optional[Dict[int, Tuple[jnp.ndarray, jnp.ndarray]]] = None


def attention_resolutions(latent_h: int, latent_w: int) -> Tuple[Tuple[int, int], ...]:
    """Self-attention (h, w) grids of the SD UNet for a given latent size.

    SD-1.5 runs spatial transformers at latent, /2, /4 and /8 resolutions
    (the /8 one only in the mid block).  Mirrors the reference's
    `get_down_h_w` ceil-division chain (attention.py:713-733).
    """
    out = []
    h, w = latent_h, latent_w
    for _ in range(4):
        out.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    return tuple(out)


def nearest_resize(mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[H, W] -> [h, w] nearest resize with *torch* semantics.

    torch `F.interpolate(mode='nearest')` anchors top-left
    (src = floor(dst * in/out)); jax.image.resize samples pixel centres —
    on binary masks every boundary token differs.  All mask plumbing uses
    this gather so the attention masks match the reference bit-for-bit
    (pinned against torch in tests/test_reference_golden.py).
    """
    mh, mw = mask.shape
    rows = jnp.floor(jnp.arange(h) * (mh / h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w) * (mw / w)).astype(jnp.int32)
    return mask.astype(jnp.float32)[rows][:, cols]


def downsample_mask(mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbour mask downsample to (h, w), flattened to [h*w].

    Matches the reference's `F.interpolate(mode='nearest')` on the full-res
    mask (attention.py:852-854) exactly — see `nearest_resize`.
    """
    return nearest_resize(mask, h, w).reshape(-1)


def build_mask_pyramid(
    mask: jnp.ndarray, latent_h: int, latent_w: int
) -> Dict[int, jnp.ndarray]:
    """Full-res [H, W] mask -> {seq_len: [seq_len] float32} pyramid."""
    pyr = {}
    for h, w in attention_resolutions(latent_h, latent_w):
        pyr[h * w] = downsample_mask(mask, h, w)
    return pyr


def build_mask_stack_pyramid(
    masks: jnp.ndarray, latent_h: int, latent_w: int
) -> Dict[int, jnp.ndarray]:
    """[N, H, W] mask stack -> {seq_len: [N, seq_len]} pyramid."""
    pyr = {}
    for h, w in attention_resolutions(latent_h, latent_w):
        m = jax.vmap(lambda x: downsample_mask(x, h, w))(masks)
        pyr[h * w] = m
    return pyr
