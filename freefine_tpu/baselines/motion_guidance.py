"""MotionGuidance baseline core, TPU-native.

Reimplements the editing method of evaluation/MotionGuidance (reference:
eval_geobench.py, losses.py, ldm/models/diffusion/ddim_with_grad.py:57-232)
on the freefine_tpu stack: flow-guided diffusion sampling.  A target optical
flow (built analytically from the GeoBench edit_param) defines an energy

    E(x0) = flow_weight * |RAFT(src, x0) - target_flow|_1
          + color_weight * |src - warp(x0, RAFT(src, x0))|_1 (occlusion-masked)

whose gradient — taken through the RAFT flow network AND the VAE decode —
steers every denoise step, with RePaint-style latent pinning outside the
edit mask and recursive (time-travel) resampling.

TPU-first design differences:
  * RAFT is the Flax re-host (freefine_tpu.models.raft) built on the XLA
    correlation volume (no alt_cuda_corr); the whole energy is one
    `jax.grad` through UNet -> DDIM x0 -> VAE decode -> RAFT.
  * The step loop is a lax.scan and the per-step recursive loop a
    lax.fori_loop; the guidance schedule is a traced per-step array.
  * `warp` uses map_coordinates with mirror padding — the exact pixel
    mapping of torch grid_sample padding_mode='reflection' with
    align_corners=True (reflection about edge pixel CENTERS; golden-pinned
    in tests/test_reference_golden_baselines2.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.schedulers.ddim import DDIMSchedule


# ---------------------------------------------------------------------------
# Flow utilities (flow_utils.py ports)
# ---------------------------------------------------------------------------


def warp(im: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp [B, H, W, C] by a relative pixel flow [B, H, W, 2]
    (x, y) — flow_utils.warp + normalize_flow (absolute sampling positions,
    mirror padding = grid_sample 'reflection' @ align_corners=True)."""
    b, h, w, c = im.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32), indexing="ij",
    )

    def one(img, f):
        yy = ys + f[..., 1]
        xx = xs + f[..., 0]

        def per_channel(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [yy, xx], order=1, mode="mirror"
            )
        return jax.vmap(per_channel, in_axes=-1, out_axes=-1)(img)

    return jax.vmap(one)(im, flow)


def occlusion_mask(target_flow: jnp.ndarray) -> jnp.ndarray:
    """Occluded-region mask for the color term (losses.py:27-40): pixels the
    target flow maps onto (disoccluded origins) found via the gradient of a
    self-warp; source pixels (non-zero flow) stay unmasked.  Returns
    [B, H, W, 1] with 0 = masked out."""
    def warped_sum(f):
        wf = warp(f, f)
        return jnp.sum(wf * (f != wf))

    grad = jax.grad(warped_sum)(target_flow)
    occ = 1.0 - (jnp.sum(jnp.abs(grad), -1, keepdims=True) != 0).astype(
        jnp.float32
    )
    moving = jnp.sum(jnp.abs(target_flow), -1, keepdims=True) != 0
    return jnp.where(moving, 1.0, occ)


def gen_flow(edit_param, mask: np.ndarray) -> np.ndarray:
    """Analytic target flow from a GeoBench edit_param over the object mask
    (eval_geobench.py:gen_flow): translation, z-rotation about the mask
    centroid, or uniform scale.  Returns [1, H, W, 2] (x, y) pixels."""
    p = list(map(float, edit_param))
    m = np.asarray(mask) > 127
    h, w = m.shape
    flow = np.zeros((1, h, w, 2), np.float32)
    if p[0] != 0 or p[1] != 0:
        flow[0, m, 0] = p[0]
        flow[0, m, 1] = p[1]
        return flow
    ys, xs = np.nonzero(m)
    if len(ys) == 0:
        return flow
    cy, cx = ys.mean(), xs.mean()
    if p[5] != 0:
        th = np.deg2rad(-p[5])
        a, b = np.cos(th), np.sin(th)
        ny = a * (ys - cy) - b * (xs - cx) + cy
        nx = b * (ys - cy) + a * (xs - cx) + cx
    elif p[6] != 1 and p[6] != 0:
        s = p[6]
        ny = s * (ys - cy) + cy
        nx = s * (xs - cx) + cx
    else:
        return flow
    flow[0, ys, xs, 0] = nx - xs
    flow[0, ys, xs, 1] = ny - ys
    return flow


# ---------------------------------------------------------------------------
# Flow energy (losses.FlowLoss port)
# ---------------------------------------------------------------------------


def make_flow_loss(raft_apply, target_flow: jnp.ndarray,
                   flow_weight: float = 3.0, color_weight: float = 100.0):
    """Returns loss(pred_img, src_img) with images in [-1, 1]
    (losses.py:48-85; eval weights 100/3, eval_geobench.py:76)."""
    mask_occ = occlusion_mask(target_flow)

    def loss(pred, src):
        pred01 = pred / 2.0 + 0.5
        src01 = src / 2.0 + 0.5
        flow = raft_apply(src01, pred01)
        flow_loss = jnp.mean(jnp.abs(target_flow - flow))
        pred_warped = warp(pred01, flow)
        color_loss = jnp.mean(jnp.abs(src01 * mask_occ - pred_warped * mask_occ))
        return flow_weight * flow_loss + color_weight * color_loss

    return loss


# ---------------------------------------------------------------------------
# The guided sampler
# ---------------------------------------------------------------------------


class MotionGuidance:
    """Flow-guided text-to-image editing over a FreeFine pipeline + RAFT.

    GeoBench protocol (eval_geobench.py:75-100): 50-step DDIM from pure
    noise, CFG 7.5, eta 0, 10 recursive steps, guidance weight 300, grad
    clip 200, energy = FlowLoss(color 100, flow 3, occlusion-masked).
    """

    def __init__(self, pipe, raft, raft_params):
        self.pipe = pipe
        self.raft = raft
        self.raft_params = raft_params
        self._cache = {}

    def _sampler(self, steps: int, num_recursive: int, guidance_weight: float,
                 clip_grad: float, cfg_scale: float):
        key = (steps, num_recursive, guidance_weight, clip_grad, cfg_scale)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=steps)

        def decode(params, z):
            """Scaled latents -> [-1, 1] RGB (differentiable; the reference's
            decode_first_stage_with_grad, ddim_with_grad.py:171)."""
            return pipe.vae.apply(params["vae"], z, method=pipe.vae.decode)

        def run(params, src_img, src_z0, ctx2, target_flow, edit_mask,
                g_sched, rng):
            loss_fn = make_flow_loss(
                lambda a, b: self.raft.apply(self.raft_params, a, b),
                target_flow,
            )

            def energy(z, t):
                pair = jnp.concatenate([z, z], axis=0)
                eps2 = pipe.unet.apply(params["unet"], pair, t, ctx2)
                u, c = eps2[:1], eps2[1:]
                eps = (u + cfg_scale * (c - u)).astype(jnp.float32)
                a_t = schedule.alpha_at(t)
                x0 = (z.astype(jnp.float32) - jnp.sqrt(1.0 - a_t) * eps) / (
                    jnp.sqrt(a_t)
                )
                recon = decode(params, x0)
                return loss_fn(recon, src_img), eps

            def step(carry, inp):
                z, rng = carry
                t, g_w = inp
                a_t = schedule.alpha_at(t)
                a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
                beta_t = a_t / a_p
                sqrt_1m = jnp.sqrt(1.0 - a_t)

                def recursive(j, state):
                    z, rng, _ = state
                    rng, r1, r2 = jax.random.split(rng, 3)
                    # RePaint latent pinning (ddim_with_grad.py:147-153)
                    noise = jax.random.normal(r1, z.shape, jnp.float32)
                    gt = (jnp.sqrt(a_t) * src_z0.astype(jnp.float32)
                          + jnp.sqrt(1.0 - a_t) * noise)
                    z = jnp.where(edit_mask > 0, gt.astype(z.dtype), z)

                    (loss, eps), grad = jax.value_and_grad(
                        energy, has_aux=True
                    )(z, t)
                    g = -grad.astype(jnp.float32) * guidance_weight * g_w
                    gnorm = jnp.linalg.norm(sqrt_1m * g)
                    scale = jnp.where(
                        (clip_grad > 0) & (gnorm > clip_grad),
                        clip_grad / jnp.maximum(gnorm, 1e-12), 1.0,
                    )
                    eps = eps - sqrt_1m * g * scale

                    # DDIM step (eta 0) + recursive re-noise
                    z32 = z.astype(jnp.float32)
                    x0 = (z32 - sqrt_1m * eps) / jnp.sqrt(a_t)
                    z_prev = jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps
                    recur = jax.random.normal(r2, z.shape, jnp.float32)
                    z_next = (jnp.sqrt(beta_t) * z_prev
                              + jnp.sqrt(1.0 - beta_t) * recur)
                    return (z_next.astype(z.dtype), rng,
                            z_prev.astype(z.dtype))

                z, rng, z_prev = jax.lax.fori_loop(
                    0, num_recursive, recursive, (z, rng, z)
                )
                return (z_prev, rng), None

            rng, r0 = jax.random.split(rng)
            z = jax.random.normal(r0, src_z0.shape, jnp.float32)
            (z, _), _ = jax.lax.scan(
                step, (z, rng), (schedule.timesteps, g_sched)
            )
            return z

        self._cache[key] = jax.jit(run)
        return self._cache[key]

    def edit(
        self,
        src_image: np.ndarray,
        edit_param,
        mask: np.ndarray,
        prompt: str,
        steps: int = 50,
        num_recursive: int = 10,
        guidance_weight: float = 300.0,
        clip_grad: float = 200.0,
        cfg_scale: float = 7.5,
        guidance_schedule: Optional[np.ndarray] = None,
        edit_mask: Optional[np.ndarray] = None,
        seed: int = 42,
    ) -> np.ndarray:
        """Generate an edit of `src_image` whose flow w.r.t. the source
        matches the analytic flow of `edit_param` over `mask`."""
        pipe = self.pipe
        h, w = pipe.config.height, pipe.config.width
        lh, lw = pipe.config.latent_height, pipe.config.latent_width

        src01 = np.asarray(src_image, np.float32) / 255.0
        src = jnp.asarray(src01 * 2.0 - 1.0)[None]
        src_z0 = pipe.image_to_latent(src_image)
        ctx_u = pipe.encode_text([""])
        ctx_c = pipe.encode_text([prompt])
        ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0)

        flow = jnp.asarray(gen_flow(edit_param, mask))
        em = (
            jnp.zeros((1, lh, lw, 1), jnp.float32) if edit_mask is None
            else jax.image.resize(
                jnp.asarray(edit_mask, jnp.float32), (lh, lw), "nearest"
            )[None, :, :, None]
        )
        g = (
            np.ones(steps, np.float32) if guidance_schedule is None
            else np.asarray(guidance_schedule[:steps], np.float32)
        )

        run = self._sampler(steps, num_recursive, float(guidance_weight),
                            float(clip_grad), float(cfg_scale))
        z = run(pipe.params, src, src_z0, ctx2, flow, em,
                jnp.asarray(g), jax.random.key(seed))
        return pipe.latent_to_image(z)[0]
