"""Energy guidance: DragonDiffusion-style feature-cosine gradients on TPU.

Parity target: the reference bundles DragonDiffusion as a GeoBench baseline
whose editor differentiates feature-cosine losses w.r.t. the latent through
the UNet (evaluation/DragonDiffusion/src/models/Sampler.py:60-235,
`guidance_move`).  Here the same energies become a pure function whose
gradient is one `jax.grad` through the jitted Flax UNet's `return_features`
path — no retain_graph bookkeeping, one fused XLA backward.

Energies (guidance_move parity, Sampler.py:153-235):
  * edit     : w_edit / (1 + 4 * sim(cur@mask_cur, tar@mask_tar))
  * content  : w_content / (1 + 4 * sim(cur, tar_org) @ mask_other)
  * contrast : w_contrast * (cos+1)/2 on the non-overlap region
  * inpaint  : w_inpaint / (1 + 4 * cos(masked means))
Guidance = 8e-2 * (grad_edit * mask_edit + grad_content * (1 - mask_edit)).

Deliberate deviation (documented): the reference pairs masked pixels of
mask_cur/mask_tar in scan order (Sampler.py:197-200), which only aligns
when both masks are the same region translated; we pair through an explicit
`tar_warp` affine map (the edit's known transform) — fixed-shape, jittable,
and correct for rotation/scale as well.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _resize(f: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """[B, h, w, C] -> [B, hw[0], hw[1], C] nearest — the reference
    upsamples its feature maps with F.interpolate's DEFAULT mode
    (Sampler.py:182,186,194), which is nearest, not bilinear
    (golden-pinned in tests/test_reference_golden_baselines2.py)."""
    b, _, _, c = f.shape
    return jax.image.resize(f, (b, hw[0], hw[1], c), method="nearest")


def masked_cosine(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Mean over masked positions of per-pixel channel cosine.

    a, b: [h, w, C]; mask: [h, w] weights.

    eps enters as torch.nn.CosineSimilarity's clamp — max(den, eps), NOT
    den + eps — so the backward matches the reference's autograd exactly
    when norms exceed eps (DragonDiffusion golden, Sampler.py:171)."""
    ct = jnp.promote_types(a.dtype, jnp.float32)  # bf16 up, f64 preserved
    a32, b32 = a.astype(ct), b.astype(ct)
    num = (a32 * b32).sum(-1)
    den = jnp.maximum(
        jnp.linalg.norm(a32, axis=-1) * jnp.linalg.norm(b32, axis=-1), eps
    )
    cos = num / den
    return (cos * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def global_masked_cosine(
    a: jnp.ndarray, b: jnp.ndarray, mask_a: jnp.ndarray, mask_b: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Cosine of the masked mean feature vectors (torch clamp-eps)."""
    ct = jnp.promote_types(a.dtype, jnp.float32)
    ma = (a.astype(ct) * mask_a[..., None]).sum((0, 1)) / jnp.maximum(
        mask_a.sum(), 1.0
    )
    mb = (b.astype(ct) * mask_b[..., None]).sum((0, 1)) / jnp.maximum(
        mask_b.sum(), 1.0
    )
    return (ma @ mb) / jnp.maximum(
        jnp.linalg.norm(ma) * jnp.linalg.norm(mb), eps
    )


def warp_features(f: jnp.ndarray, inv_matrix: jnp.ndarray) -> jnp.ndarray:
    """Affine-resample a [h, w, C] feature map (dst->src matrix in the
    feature grid's pixel units)."""
    from jax.scipy.ndimage import map_coordinates

    h, w, c = f.shape
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    sx = inv_matrix[0, 0] * xs + inv_matrix[0, 1] * ys + inv_matrix[0, 2]
    sy = inv_matrix[1, 0] * xs + inv_matrix[1, 1] * ys + inv_matrix[1, 2]

    def chan(fc):
        return map_coordinates(fc, [sy, sx], order=1, mode="constant", cval=0.0)

    return jnp.stack([chan(f[:, :, i]) for i in range(c)], axis=-1)


def move_energy(
    unet_apply,
    params,
    latent: jnp.ndarray,           # [1, h, w, 4] current latent
    ref_latent: jnp.ndarray,       # [1, h, w, 4] inverted reference latent
    t: jnp.ndarray,
    text_emb: jnp.ndarray,         # [1, 77, D]
    *,
    feature_indices: Sequence[int] = (1, 2),
    target_hw: Tuple[int, int],
    inv_warp: Optional[jnp.ndarray],  # dst->src affine on the feature grid
    mask_cur: jnp.ndarray,         # [H', W'] target-position mask
    mask_other: jnp.ndarray,       # [H', W'] content-preservation region
    mask_non_overlap: jnp.ndarray, # [H', W'] vacated region
    w_edit: float = 4.0,
    w_content: float = 6.0,
    w_contrast: float = 0.2,
    w_inpaint: float = 0.8,
    split: bool = False,
):
    """Object-move editing energy (guidance_move, Sampler.py:150-235).

    `unet_apply(params, sample, t, text_emb, return_features=True)` must
    return (eps, features) with features a list of up-block hidden states
    (freefine_tpu UNet `return_features`, models/unet.py).

    Returns the scalar total, or — with ``split=True`` — the reference's
    (loss_edit, loss_con) pair, whose gradients it composes separately
    (Sampler.py:226-232; golden-pinned in
    tests/test_reference_golden_baselines2.py).  Term structure is the
    reference's exactly: per-level 0.5 loss_scale on the edit / content /
    contrast terms, the w_inpaint term UNSCALED per level
    (Sampler.py:224 has no loss_scale factor).
    """
    loss_scale = (0.5, 0.5)

    # This energy is differentiated w.r.t. `latent`: the plain-attention
    # path routes through flash_sdpa_diff (custom VJP), so the flash
    # kernels stay active here.  (`flash_suspended` remains available for
    # any future differentiated path that hits the VJP-less tca_flash.)
    _, feats_tar = unet_apply(
        params, ref_latent, t, text_emb, return_features=True
    )
    feats_tar = [jax.lax.stop_gradient(feats_tar[i]) for i in feature_indices]
    _, feats_cur = unet_apply(params, latent, t, text_emb, return_features=True)
    feats_cur = [feats_cur[i] for i in feature_indices]

    loss_edit = jnp.float32(0.0)
    loss_con = jnp.float32(0.0)
    for s, fc, ft in zip(loss_scale, feats_cur, feats_tar):
        fc = _resize(fc, target_hw)[0]
        ft = _resize(ft, target_hw)[0]
        ft_warp = ft if inv_warp is None else warp_features(ft, inv_warp)

        sim_edit = masked_cosine(fc, ft_warp, mask_cur)
        loss_edit = loss_edit + s * w_edit / (1.0 + 4.0 * sim_edit)

        sim_other = masked_cosine(fc, ft, mask_other)
        loss_con = loss_con + s * w_content / (1.0 + 4.0 * sim_other)

        sim_no = (masked_cosine(fc, ft, mask_non_overlap) + 1.0) / 2.0
        loss_con = loss_con + s * w_contrast * sim_no

        sim_inp = (
            global_masked_cosine(fc, ft, mask_non_overlap, mask_other) + 1.0
        ) / 2.0
        loss_con = loss_con + w_inpaint / (1.0 + 4.0 * sim_inp)
    if split:
        return loss_edit, loss_con
    return loss_edit + loss_con


def energy_guidance(
    unet_apply,
    params,
    latent: jnp.ndarray,
    ref_latent: jnp.ndarray,
    t: jnp.ndarray,
    text_emb: jnp.ndarray,
    energy_scale: float,
    guidance_mask: jnp.ndarray,    # [h, w] latent-res edit mask
    **energy_kwargs,
) -> jnp.ndarray:
    """d(energy)/d(latent), composed EXACTLY as the reference does
    (Sampler.py:226-232): one forward linearisation, two gradient pulls
    (torch's retain_graph double-backward), then
    8e-2 * (grad_edit inside the edit mask + grad_con outside it).
    `guidance_mask` is the latent-resolution edit mask (the reference's
    mask_edit1 = mask_cur>0.5 resized to the latent grid)."""
    (l_e, l_c), pull = jax.vjp(
        lambda z: move_energy(
            unet_apply, params, z, ref_latent, t, text_emb, split=True,
            **energy_kwargs
        ),
        latent,
    )
    dt = jnp.result_type(l_e)  # f32 in serving, f64 under jax.enable_x64
    one = jnp.asarray(energy_scale, dt)
    zero = jnp.asarray(0.0, dt)
    g_edit = pull((one, zero))[0]
    g_con = pull((zero, one))[0]
    m = (guidance_mask > 0.5).astype(g_edit.dtype)[None, :, :, None]
    return 8e-2 * (g_edit * m + g_con * (1.0 - m))
