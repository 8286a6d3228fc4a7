"""Mask engine: jittable mask algebra for all editing tasks.

Reimplements the reference's mask-family preparation
(/root/reference/src/demo/model.py:927-943,1392-1639) as pure JAX ops at
static resolutions:

  * dilation / erosion  -> `lax.reduce_window` max/min pools (the TPU-native
    replacement for `cv2.dilate`/`cv2.erode`, model.py:927-943), with cv2's
    even-kernel anchor convention reproduced exactly;
  * nearest-resize + binarise -> `prepare_tensor_mask` (model.py:1622-1639);
  * the four `prepare_various_mask` branches (use_auto_draw x
    reduce_inp_artifacts, model.py:1432-1512);
  * composition masks incl. appearance-transfer mode (model.py:1515-1609);
  * bggen masks (model.py:1611-1620);
  * `prepare_surrounding_mask` bbox jitter (model.py:1392-1426).

All functions take/return float32 [H, W] arrays in {0,1} (soft where the
reference is soft).  The family of outputs feeds `EditState` pyramids and the
latent-resolution CFG / perturbation masks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from freefine_tpu.edit import nearest_resize


def binarize(mask: jnp.ndarray) -> jnp.ndarray:
    """>0 -> 1.0 (the reference's `mask[mask>0]=1`)."""
    return (mask > 0).astype(jnp.float32)


def prepare_mask(
    mask: jnp.ndarray, h: int, w: int, binary: bool = True
) -> jnp.ndarray:
    """Reference `prepare_tensor_mask` (model.py:1622-1639).

    [H, W] or [H, W, C] (channel 0) -> nearest-resized [h, w] float32;
    binarised (>0) or max-normalised.
    """
    m = mask
    if m.ndim == 3:
        m = m[:, :, 0]
    m = m.astype(jnp.float32)
    if m.shape != (h, w):
        m = nearest_resize(m, h, w)
    if binary:
        return binarize(m)
    return m / jnp.maximum(m.max(), 1e-8)


def dilate(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    """cv2.dilate with a `factor`x`factor` all-ones kernel (model.py:927-935).

    cv2 anchors even kernels at (k//2, k//2), so the window covers offsets
    [-k//2, k - k//2 - 1] — reproduced via asymmetric padding.
    """
    if factor <= 1:
        return mask
    lo = factor // 2
    hi = factor - lo - 1
    return jax.lax.reduce_window(
        mask.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(factor, factor),
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
    )


def erode(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    """cv2.erode analogue (min-pool), model.py:937-943."""
    if factor <= 1:
        return mask
    lo = factor // 2
    hi = factor - lo - 1
    return jax.lax.reduce_window(
        mask.astype(jnp.float32),
        jnp.inf,
        jax.lax.min,
        window_dimensions=(factor, factor),
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
    )


def to_latent_res(mask: jnp.ndarray, lh: int, lw: int) -> jnp.ndarray:
    """Nearest-downsample a full-res mask to the latent grid (torch anchor
    convention, see edit.nearest_resize)."""
    return nearest_resize(mask.astype(jnp.float32), lh, lw)


class EditMasks(NamedTuple):
    """Mask family for the `generation` task (reference
    prepare_various_mask returns, model.py:1432-1512 + orchestrator
    assignment at :1663-1676)."""

    fg_retain: jnp.ndarray       # full-res: TCA query mask == local CFG region
    fg_retain_st2: jnp.ndarray   # full-res: bare target mask (tca bookkeeping)
    fg_ref: jnp.ndarray          # full-res: source-object key mask
    completion_cfg: jnp.ndarray  # latent-res: local CFG multiplier
    local_var: jnp.ndarray       # latent-res: DDPM perturbation region


def prepare_various_mask(
    shifted_mask: jnp.ndarray,
    ori_mask: jnp.ndarray,
    draw_mask: Optional[jnp.ndarray],
    h: int,
    w: int,
    latent_h: int,
    latent_w: int,
    use_auto_draw: bool = False,
    cons_area: Optional[jnp.ndarray] = None,
    reduce_inp_artifacts: bool = False,
) -> EditMasks:
    """The four-branch mask builder for geometric edits (model.py:1432-1512).

    shifted_mask: target(post-transform) object mask; ori_mask: source mask;
    draw_mask: user completion region (branches with use_auto_draw=False);
    cons_area: union of other objects' regions to protect.
    """
    shifted = prepare_mask(shifted_mask, h, w)
    ori = prepare_mask(ori_mask, h, w)

    if not use_auto_draw:
        assert draw_mask is not None, "draw_mask required when use_auto_draw=False"
        flexible = prepare_mask(draw_mask, h, w) * (1.0 - shifted)
        fg = binarize(flexible + shifted)
        complete = flexible
        if not reduce_inp_artifacts:
            local_var = flexible
        else:
            assert cons_area is not None, "cons_area required with reduce_inp_artifacts"
            dil_ori = prepare_mask(dilate(prepare_mask(ori_mask, h, w), 30), h, w)
            cons = prepare_mask(cons_area, h, w)
            local_var = binarize(
                (1.0 - cons) * (1.0 - shifted) * dil_ori + flexible
            )
    else:
        assert cons_area is not None, "cons_area required with use_auto_draw"
        dil_tgt = prepare_mask(dilate(prepare_mask(shifted_mask, h, w), 15), h, w)
        cons = prepare_mask(cons_area, h, w) - ori  # may go negative, as in ref
        fg = shifted
        if not reduce_inp_artifacts:
            complete = (1.0 - cons) * (1.0 - shifted) * dil_tgt
        else:
            dil_ori = prepare_mask(dilate(prepare_mask(ori_mask, h, w), 30), h, w)
            complete = binarize(dil_ori + dil_tgt) * (1.0 - cons) * (1.0 - shifted)
        local_var = complete

    return EditMasks(
        fg_retain=fg,
        fg_retain_st2=shifted,
        fg_ref=ori,
        completion_cfg=to_latent_res(complete, latent_h, latent_w),
        local_var=to_latent_res(local_var, latent_h, latent_w),
    )


class ComposeMasks(NamedTuple):
    """Reference prepare_composition_masks returns (model.py:1515-1609)."""

    tgt_masks: jnp.ndarray       # [N+1 or P, H, W] per-region query masks (last=bg)
    src_masks: jnp.ndarray       # [N, H, W] per-source key masks
    local_var: jnp.ndarray       # latent-res DDPM region
    completion_cfg: jnp.ndarray  # latent-res local CFG multiplier


def prepare_composition_masks(
    ori_masks: Sequence[jnp.ndarray],
    tgt_masks: Sequence[jnp.ndarray],
    h: int,
    w: int,
    latent_h: int,
    latent_w: int,
    dil_completion: bool = False,
    dil_factor: int = 15,
    draw_masks: Optional[Sequence[jnp.ndarray]] = None,
    appearance_transfer: bool = False,
) -> ComposeMasks:
    src = jnp.stack([prepare_mask(m, h, w) for m in ori_masks])

    if appearance_transfer:
        tgt_list = []
        local_pert = jnp.zeros((h, w), jnp.float32)
        for m in tgt_masks:
            d = prepare_mask(dilate(prepare_mask(m, h, w), dil_factor), h, w)
            tgt_list.append(d)
            local_pert = local_pert + d
        local_pert = binarize(local_pert)
        tgt_list.append(1.0 - local_pert)
        lv = to_latent_res(local_pert, latent_h, latent_w)
        return ComposeMasks(jnp.stack(tgt_list), src, lv, lv)

    if draw_masks is None:
        tgt_list = []
        local_pert = jnp.zeros((h, w), jnp.float32)
        fg = jnp.zeros((h, w), jnp.float32)
        for m in tgt_masks:
            sm = prepare_mask(m, h, w)
            dm = prepare_mask(dilate(sm, dil_factor), h, w)
            tgt_list.append(dm if dil_completion else sm)
            fg = fg + sm
            local_pert = local_pert + dm
        fg = binarize(fg)
        local_pert = binarize(local_pert)
        tgt_list.append(1.0 - (fg if dil_completion else local_pert))
        boundary = local_pert * (1.0 - fg)
        lv = to_latent_res(boundary, latent_h, latent_w)
        cfg = jnp.zeros_like(lv) if not dil_completion else lv
        return ComposeMasks(jnp.stack(tgt_list), src, lv, cfg)

    # user draw masks aligned with target masks
    tgt_list = []
    local_pert = jnp.zeros((h, w), jnp.float32)
    fg = jnp.zeros((h, w), jnp.float32)
    for m, d in zip(tgt_masks, draw_masks):
        sm = prepare_mask(m, h, w)
        dm = binarize(prepare_mask(d, h, w) + sm)
        tgt_list.append(dm)
        fg = fg + sm
        local_pert = local_pert + dm
    fg = binarize(fg)
    local_pert = binarize(local_pert)
    tgt_list.append(1.0 - local_pert)
    boundary = local_pert * (1.0 - fg)
    lv = to_latent_res(boundary, latent_h, latent_w)
    return ComposeMasks(jnp.stack(tgt_list), src, lv, lv)


def prepare_mask_bggen(
    mask: jnp.ndarray, h: int, w: int, latent_h: int, latent_w: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(full-res object mask, latent-res perturbation mask)
    (model.py:1611-1620)."""
    m = prepare_mask(mask, h, w)
    return m, to_latent_res(m, latent_h, latent_w)


def prepare_surrounding_mask(
    shifted_mask: jnp.ndarray, cons_area: jnp.ndarray, rate: float = 0.5
) -> jnp.ndarray:
    """Bbox-expanded surrounding region (model.py:1392-1426).

    Host-or-device: uses arithmetic min/max so it stays jittable with the
    empty-mask guard folded in (empty mask -> zeros).
    """
    m = binarize(shifted_mask)
    h, w = m.shape
    rows = m.max(axis=1)
    cols = m.max(axis=0)
    any_on = m.max() > 0
    ridx = jnp.arange(h, dtype=jnp.float32)
    cidx = jnp.arange(w, dtype=jnp.float32)
    big = jnp.float32(10**9)
    y_min = jnp.min(jnp.where(rows > 0, ridx, big))
    y_max = jnp.max(jnp.where(rows > 0, ridx, -big))
    x_min = jnp.min(jnp.where(cols > 0, cidx, big))
    x_max = jnp.max(jnp.where(cols > 0, cidx, -big))
    jx = jnp.floor(rate * (x_max - x_min))
    jy = jnp.floor(rate * (y_max - y_min))
    nx0 = jnp.maximum(0.0, x_min - jx)
    ny0 = jnp.maximum(0.0, y_min - jy)
    nx1 = jnp.minimum(x_max + jx, w - 1.0)
    ny1 = jnp.minimum(y_max + jy, h - 1.0)
    region = (
        (ridx[:, None] >= ny0) & (ridx[:, None] <= ny1)
        & (cidx[None, :] >= nx0) & (cidx[None, :] <= nx1)
    ).astype(jnp.float32)
    out = region * (1.0 - binarize(cons_area)) * (1.0 - m)
    return jnp.where(any_on, out, jnp.zeros_like(m))


def get_constrain_areas(mask_list: Sequence[jnp.ndarray], h: int, w: int) -> jnp.ndarray:
    """Union of instance masks to protect from edits
    (reference src/utils/vis_utils.py:183-193)."""
    out = jnp.zeros((h, w), jnp.float32)
    for m in mask_list:
        out = out + prepare_mask(m, h, w)
    return binarize(out)
