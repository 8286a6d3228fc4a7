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
    """[B, h, w, C] -> [B, hw[0], hw[1], C] bilinear."""
    b, _, _, c = f.shape
    return jax.image.resize(f, (b, hw[0], hw[1], c), method="bilinear")


def masked_cosine(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Mean over masked positions of per-pixel channel cosine.

    a, b: [h, w, C]; mask: [h, w] weights."""
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    num = (a32 * b32).sum(-1)
    den = jnp.linalg.norm(a32, axis=-1) * jnp.linalg.norm(b32, axis=-1) + eps
    cos = num / den
    return (cos * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def global_masked_cosine(
    a: jnp.ndarray, b: jnp.ndarray, mask_a: jnp.ndarray, mask_b: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Cosine of the masked mean feature vectors."""
    ma = (a.astype(jnp.float32) * mask_a[..., None]).sum((0, 1)) / jnp.maximum(
        mask_a.sum(), 1.0
    )
    mb = (b.astype(jnp.float32) * mask_b[..., None]).sum((0, 1)) / jnp.maximum(
        mask_b.sum(), 1.0
    )
    return (ma @ mb) / (jnp.linalg.norm(ma) * jnp.linalg.norm(mb) + eps)


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
) -> jnp.ndarray:
    """Scalar energy for object-move editing.

    `unet_apply(params, sample, t, text_emb, return_features=True)` must
    return (eps, features) with features a list of up-block hidden states
    (freefine_tpu UNet `return_features`, models/unet.py).
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

    loss = jnp.float32(0.0)
    for s, fc, ft in zip(loss_scale, feats_cur, feats_tar):
        fc = _resize(fc, target_hw)[0]
        ft = _resize(ft, target_hw)[0]
        ft_warp = ft if inv_warp is None else warp_features(ft, inv_warp)

        sim_edit = masked_cosine(fc, ft_warp, mask_cur)
        loss = loss + s * w_edit / (1.0 + 4.0 * sim_edit)

        sim_other = masked_cosine(fc, ft, mask_other)
        loss = loss + s * w_content / (1.0 + 4.0 * sim_other)

        sim_no = (masked_cosine(fc, ft, mask_non_overlap) + 1.0) / 2.0
        loss = loss + s * w_contrast * sim_no

        sim_inp = (
            global_masked_cosine(fc, ft, mask_non_overlap, mask_other) + 1.0
        ) / 2.0
        loss = loss + s * w_inpaint / (1.0 + 4.0 * sim_inp)
    return loss


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
    """d(energy)/d(latent), composed as the reference does
    (Sampler.py:226-232): grad * 8e-2, edit grads inside the mask and
    content grads outside (here one energy carries both terms; the mask
    still localises the perturbation)."""
    grad = jax.grad(
        lambda z: move_energy(
            unet_apply, params, z, ref_latent, t, text_emb, **energy_kwargs
        )
        * energy_scale
    )(latent)
    m = guidance_mask[None, :, :, None]
    return 8e-2 * grad * jnp.maximum(m, 0.25)
