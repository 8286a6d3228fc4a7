"""SV3D_p inference: 21-frame orbital novel-view synthesis on TPU.

Rebuilds the reference's SV3D usage
(/root/reference/generative-models/scripts/sampling/re_edit_3d.py:223-435,
sv3d_p.yaml) as jitted JAX: EDM discretisation + Euler sampler compiled as
one `lax.scan`, triangle-CFG prediction guiding, VScaling-with-EDM-c-noise
denoiser, orbit conditioning (cond_aug / polar / azimuth sinusoid
embeddings), and the crop -> synthesise -> re-mask -> paste-back coarse-3D
editing flow (`pasted_sv3d_back_to_img`, re_edit_3d.py:691-750).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.models.layers import timestep_embedding
from freefine_tpu.models.video_unet import VideoUNet


# -- EDM pieces (sgm/modules/diffusionmodules) --------------------------------


def edm_sigmas(
    num_steps: int, sigma_min: float = 0.002, sigma_max: float = 700.0,
    rho: float = 7.0,
) -> jnp.ndarray:
    """EDMDiscretization (discretizer.py): Karras sigma schedule, descending,
    with the trailing 0."""
    ramp = jnp.linspace(0, 1, num_steps)
    min_r = sigma_min ** (1 / rho)
    max_r = sigma_max ** (1 / rho)
    sigmas = (max_r + ramp * (min_r - max_r)) ** rho
    return jnp.concatenate([sigmas, jnp.zeros((1,))])


def v_scaling_edm_cnoise(sigma: jnp.ndarray):
    """VScalingWithEDMcNoise (denoiser_scaling.py:51-63):
    c_skip = 1/(s^2+1); c_out = -s/sqrt(s^2+1); c_in = 1/sqrt(s^2+1);
    c_noise = 0.25 log(s)."""
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


def triangle_guidance_scales(
    num_frames: int, max_scale: float = 2.5, min_scale: float = 1.0
) -> jnp.ndarray:
    """TrianglePredictionGuider (guiders.py): CFG scale rises linearly to
    max at the middle frame and back to min."""
    t = jnp.linspace(0, 1, num_frames)
    tri = 1.0 - jnp.abs(2.0 * t - 1.0)
    return min_scale + (max_scale - min_scale) * tri


def concat_timestep_embed(values: jnp.ndarray, outdim: int) -> jnp.ndarray:
    """ConcatTimestepEmbedderND (encoders/modules.py): sinusoid-embed each
    scalar to `outdim`."""
    return timestep_embedding(values, outdim)


def build_sv3d_vector_cond(
    cond_aug: float,
    polars_rad: jnp.ndarray,     # [T]
    azimuths_rad: jnp.ndarray,   # [T]
    adm_in: int = 1280,
) -> jnp.ndarray:
    """[T, adm_in] = [cond_aug | polar | azimuth] sinusoid embeddings in the
    sv3d_p.yaml conditioner order (256/512/512 at adm_in=1280)."""
    t = azimuths_rad.shape[0]
    aug_dim = adm_in // 5
    ang_dim = (adm_in - aug_dim) // 2
    aug = concat_timestep_embed(jnp.full((t,), cond_aug), aug_dim)
    pol = concat_timestep_embed(polars_rad, ang_dim)
    azi = concat_timestep_embed(azimuths_rad, adm_in - aug_dim - ang_dim)
    return jnp.concatenate([aug, pol, azi], axis=-1)


@dataclasses.dataclass
class SV3D:
    """SV3D_p sampler wrapper.  Needs a VideoUNet + params, a VAE
    (freefine_tpu AutoencoderKL) and a CLIP image encoder for the
    conditioning-frame embedding."""

    unet: VideoUNet
    unet_params: dict
    num_frames: int = 21
    num_steps: int = 50
    sigma_max: float = 700.0
    cond_aug: float = 1e-5

    def sample_latents(
        self,
        cond_latent: jnp.ndarray,    # [1, h, w, 4] VAE latent of cond frame
        clip_tokens: jnp.ndarray,    # [1, 1, 1024] CLIP image embedding
        azimuths_deg: Sequence[float],
        elevations_deg: Sequence[float],
        rng: jax.Array,
        max_guidance: float = 2.5,
    ) -> jnp.ndarray:
        """EDM Euler sampling of the 21-frame orbit -> [T, h, w, 4]."""
        t = self.num_frames
        h, w = cond_latent.shape[1:3]
        sigmas = edm_sigmas(self.num_steps, sigma_max=self.sigma_max)
        scales = triangle_guidance_scales(t, max_guidance)[:, None, None, None]

        azim = jnp.deg2rad(jnp.asarray(azimuths_deg, jnp.float32))
        # sgm uses polar = pi/2 - elevation
        polar = jnp.pi / 2 - jnp.deg2rad(jnp.asarray(elevations_deg, jnp.float32))
        y = build_sv3d_vector_cond(
            self.cond_aug, polar, azim, adm_in=self.unet.config.adm_in_channels
        )

        rng, sub = jax.random.split(rng)
        cond = jnp.tile(cond_latent, (t, 1, 1, 1))
        cond = cond + self.cond_aug * jax.random.normal(sub, cond.shape)
        ctx_c = jnp.tile(clip_tokens, (t, 1, 1))
        ctx_u = jnp.zeros_like(ctx_c)

        def denoise(x, sigma):
            c_skip, c_out, c_in, c_noise = v_scaling_edm_cnoise(sigma)
            t_cont = jnp.full((t,), c_noise)

            def run(ctx, cond_cat):
                inp = jnp.concatenate([x * c_in, cond_cat], axis=-1)
                out = self.unet.apply(self.unet_params, inp, t_cont, ctx, y)
                return out.astype(jnp.float32) * c_out + x * c_skip

            d_c = run(ctx_c, cond)
            d_u = run(ctx_u, jnp.zeros_like(cond))
            return d_u + scales * (d_c - d_u)

        rng, sub = jax.random.split(rng)
        # sgm scales the initial randn by sqrt(1 + sigma_0^2), not sigma_0
        # (BaseDiffusionSampler.prepare_sampling_loop, sampling.py:46) —
        # ~1e-6 relative at sigma_max=700, but pinned exactly by
        # tests/test_reference_golden_sv3d_sampler.py.
        x = jax.random.normal(sub, (t, h, w, 4), jnp.float32) * jnp.sqrt(
            1.0 + sigmas[0] ** 2
        )

        def step(x, i):
            sigma, next_sigma = sigmas[i], sigmas[i + 1]
            denoised = denoise(x, sigma)
            d = (x - denoised) / sigma
            return x + (next_sigma - sigma) * d, None

        x, _ = jax.lax.scan(step, x, jnp.arange(self.num_steps))
        return x


# -- coarse 3D editing flow (re_edit_3d.py:251-435, 691-750) -------------------


def crop_object_square(
    img: np.ndarray, mask: np.ndarray, out_size: int = 576,
    pad_ratio: float = 0.1, bg_value: int = 255,
) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Cut the object by its mask bbox, pad to square with white background,
    resize (re_edit_3d.py:319-342).  Returns (out_size^2 image, bbox)."""
    ys, xs = np.nonzero(np.asarray(mask) > 0)
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    obj = np.where(
        (np.asarray(mask)[y0:y1, x0:x1] > 0)[..., None],
        np.asarray(img)[y0:y1, x0:x1],
        bg_value,
    )
    h, w = obj.shape[:2]
    side = int(max(h, w) * (1 + pad_ratio))
    canvas = np.full((side, side, 3), bg_value, np.uint8)
    oy, ox = (side - h) // 2, (side - w) // 2
    canvas[oy : oy + h, ox : ox + w] = obj
    out = jax.image.resize(
        jnp.asarray(canvas, jnp.float32), (out_size, out_size, 3), "linear"
    )
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8), (x0, y0, x1, y1)


def paste_novel_view_back(
    src_img: np.ndarray,
    src_mask: np.ndarray,
    view_img: np.ndarray,
    view_mask: np.ndarray,
    inp_background: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Paste the novel-view object back over the (inpainted) background,
    scaled to the original bbox (pasted_sv3d_back_to_img,
    re_edit_3d.py:691-750).  Returns (final image, target mask 0/255)."""
    src_img = np.asarray(src_img)
    src_mask = np.asarray(src_mask)
    if src_mask.ndim == 3:
        src_mask = src_mask[:, :, 0]
    if inp_background is None:
        inp_background = src_img
    ys, xs = np.nonzero(src_mask > 0)
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    bh, bw = y1 - y0, x1 - x0

    vm = np.asarray(view_mask) > 0
    vys, vxs = np.nonzero(vm)
    if len(vys) == 0:
        return np.asarray(inp_background).copy(), np.zeros_like(src_mask)
    vy0, vy1 = vys.min(), vys.max() + 1
    vx0, vx1 = vxs.min(), vxs.max() + 1
    crop = np.asarray(view_img)[vy0:vy1, vx0:vx1]
    mcrop = vm[vy0:vy1, vx0:vx1].astype(np.float32)

    rs_img = np.asarray(
        jax.image.resize(jnp.asarray(crop, jnp.float32), (bh, bw, 3), "linear")
    )
    rs_mask = np.asarray(
        jax.image.resize(jnp.asarray(mcrop), (bh, bw), "nearest")
    )
    out = np.asarray(inp_background).copy()
    region = rs_mask > 0.5
    out[y0:y1, x0:x1][region] = np.clip(rs_img[region], 0, 255).astype(np.uint8)
    tmask = np.zeros_like(src_mask)
    tmask[y0:y1, x0:x1] = (region * 255).astype(src_mask.dtype)
    return out, tmask


def pick_frame_for_angle(
    azimuths_deg: Sequence[float], target_deg: float
) -> int:
    """Index of the orbit frame closest to the requested azimuth
    (re_edit_3d.py picks the generated frame at the sampled angle)."""
    az = np.asarray(azimuths_deg, np.float64) % 360
    t = target_deg % 360
    diff = np.minimum(np.abs(az - t), 360 - np.abs(az - t))
    return int(np.argmin(diff))


def make_sv3d_edit_fn(ckpt_dir: str, seed: int = 0):
    """Build a `(img, mask, angle_deg, inp_background) -> (coarse, tgt_mask)`
    renderer from an orbax checkpoint bundle — the pluggable 3D backend of
    the dataset-authoring CLI (data/datagen.py).

    The bundle is a dict checkpoint with keys: "sv3d_unet" (required),
    "vae" (required), and optionally "clip_image" (ViT-H conditioning
    tokens; zeros without) and "u2net" (novel-view re-matting; brightness
    fallback without) — the same components the reference loads separately
    (re_edit_3d.py:223-249, rembg, CLIP embedder)."""
    import os

    import orbax.checkpoint as ocp

    from freefine_tpu.config import VAEConfig
    from freefine_tpu.models.vae import AutoencoderKL
    from freefine_tpu.models.video_unet import VideoUNet, sv3d_config

    ckptr = ocp.StandardCheckpointer()
    bundle = ckptr.restore(os.path.abspath(ckpt_dir))
    assert "sv3d_unet" in bundle and "vae" in bundle, sorted(bundle)

    unet = VideoUNet(sv3d_config())
    sv3d = SV3D(unet=unet, unet_params=bundle["sv3d_unet"])
    vae = AutoencoderKL(config=VAEConfig())

    clip_image = clip_params = None
    if bundle.get("clip_image") is not None:
        from freefine_tpu.models.clip_image import CLIPImageEncoder, clip_vit_h14

        clip_image = CLIPImageEncoder(clip_vit_h14())
        clip_params = bundle["clip_image"]
    matting = None
    if bundle.get("u2net") is not None:
        from freefine_tpu.models.u2net import U2Net, u2netp_config

        matting = (U2Net(u2netp_config()), bundle["u2net"])

    rng = jax.random.key(seed)

    def edit_fn(img, mask, angle_deg, inp_background):
        return re_edit_3d_sv3d(
            sv3d, vae, bundle["vae"], clip_image, clip_params, matting,
            img, mask, float(angle_deg), inp_background=inp_background,
            rng=rng,
        )

    return edit_fn


def re_edit_3d_sv3d(
    sv3d: "SV3D",
    vae,                # freefine_tpu AutoencoderKL module
    vae_params,
    clip_image,         # CLIPImageEncoder (ViT-H) module or None
    clip_params,
    matting,            # (model, params) U2Net pair or None
    src_img: np.ndarray,
    src_mask: np.ndarray,
    target_azimuth_deg: float,
    elevation_deg: float = 10.0,
    inp_background: Optional[np.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """SV3D-based coarse 3D edit, end to end (reference re_edit_3d.py
    sv3d_sample -> rembg re-mask -> pasted_sv3d_back_to_img, :251-750):

    crop the object square -> VAE-encode the conditioning frame -> sample
    the 21-frame orbit with azimuths hitting the target angle -> pick the
    closest frame -> re-extract its mask (U2Net matting; bbox fallback) ->
    paste over the inpainted background.

    Returns (coarse image, target mask 0/255).
    """
    from freefine_tpu.data.datagen import generate_azimuth_angles

    rng = rng if rng is not None else jax.random.key(0)
    crop, _bbox = crop_object_square(src_img, src_mask, out_size=576)

    x = jnp.asarray(crop, jnp.float32)[None] / 127.5 - 1.0
    cond_latent = vae.apply(vae_params, x, method=vae.encode)

    if clip_image is not None:
        from freefine_tpu.models.clip_image import preprocess_clip

        tok = clip_image.apply(
            clip_params, preprocess_clip(jnp.asarray(crop))
        )[None]  # [1, 1, D]
    else:
        tok = jnp.zeros((1, 1, 1024), jnp.float32)

    azimuths = generate_azimuth_angles(
        sv3d.num_frames, [target_azimuth_deg, -target_azimuth_deg]
    )
    elevations = [elevation_deg] * sv3d.num_frames
    latents = sv3d.sample_latents(
        cond_latent, tok, azimuths, elevations, rng
    )

    idx = pick_frame_for_angle(azimuths, target_azimuth_deg)
    frame = vae.apply(vae_params, latents[idx : idx + 1], method=vae.decode)
    frame_u8 = np.clip(
        (np.asarray(frame[0], np.float32) / 2.0 + 0.5) * 255.0, 0, 255
    ).astype(np.uint8)

    if matting is not None:
        from freefine_tpu.models.u2net import get_mask_from_saliency

        m_model, m_params = matting
        view_mask = get_mask_from_saliency(m_model, m_params, frame_u8)
    else:
        # fallback: everything darker than near-white background is object
        view_mask = (frame_u8.mean(-1) < 248).astype(np.uint8) * 255

    return paste_novel_view_back(
        src_img, src_mask, frame_u8, view_mask, inp_background
    )
