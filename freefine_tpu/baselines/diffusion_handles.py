"""DiffusionHandles baseline core, TPU-native.

Reimplements the editing method of evaluation/DiffusionHandles (reference:
diffhandles/{diffusion_handles.py, guided_stable_diffuser.py, losses.py})
on the freefine_tpu stack — depth-guided activation editing:

  1. Null-text inversion of the input image (per-step optimized
     unconditional embeddings so CFG sampling retraces the DDIM inversion,
     stable_null_inverter.py) + a reconstruction pass recording the three
     decoder activation maps per step.
  2. The object's depth points are 3D-transformed and reprojected,
     producing dense old->new pixel correspondences and an edited disparity
     (ops/point_splat.compute_correspondence; the background depth hole is
     infilled with the fast-marching inpainter instead of the reference's
     Laplacian solve — documented deviation).
  3. Guided generation (guided_stable_diffuser.py:293-490): per step,
     `num_optsteps` gradient updates on the latent pulling the current
     decoder activations toward the recorded ones — foreground activations
     matched ACROSS the correspondence (old position -> new position),
     background matched in place — then one CFG denoise step using the
     null-text embeddings.

Defaults from diffhandles/config/default.yaml: 50 steps, fg_weight 1.5 /
bg_weight 1.25 (x30, constant falloff to step 38), 3 opt steps at lr 0.1,
patch size 1, bg 'global_avg'.  Depth conditioning (SD-2-depth's 5th input
channel) engages when the pipeline's UNet is configured with
in_channels == 5; plain SD runs the identical guidance without it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.ops.point_splat import compute_correspondence, inpaint_fmm
from freefine_tpu.schedulers.ddim import DDIMSchedule, inv_step

# per-layer (fg, bg) weight pattern for the denoise-time schedule and the
# optimization iterations (guided_stable_diffuser.py:352-372)
OPT_WEIGHTS = [
    ([2.5, 2.5, 2.5], [1.25, 1.25, 1.25]),
    ([1.25, 1.25, 1.25], [2.5, 2.5, 2.5]),
    ([1.25, 1.25, 1.25], [1.25, 1.25, 1.25]),
    ([2.5, 2.5, 2.5], [2.5, 2.5, 2.5]),
]


# ---------------------------------------------------------------------------
# Correspondence processing (guided_stable_diffuser.py:492-560)
# ---------------------------------------------------------------------------


def process_correspondences(
    corr: np.ndarray, img_res: int, grid: int = 64, max_pts: int = 4096
):
    """Dense [H, W, 2] (row, col) correspondence (NaN outside the object)
    -> padded fg index pairs + bg masks on the `grid`^2 activation grid.

    Returns dict of arrays: fg_orig_yx / fg_trans_yx [max_pts, 2] int32
    (padded with grid, dropped by validity), fg_valid [max_pts] — the
    MULTIPLICITY of each unique coarse pair (the reference keeps every
    fine-pixel pair, so coarse cells hit by k pixels enter the loss mean
    k times, guided_stable_diffuser.py:492-560 + losses.py:51-84; a
    count-weighted mean over unique pairs is exactly that mean, pinned in
    tests/test_reference_golden_baselines2.py), bg_mask_orig /
    bg_mask_trans [grid, grid] float32.
    """
    c = np.asarray(corr)
    ys, xs = np.nonzero(np.isfinite(c[..., 0]))
    ty = c[ys, xs, 0]
    tx = c[ys, xs, 1]
    ok = (ty >= 0) & (ty < img_res) & (tx >= 0) & (tx < img_res)
    ys, xs, ty, tx = ys[ok], xs[ok], ty[ok], tx[ok]

    scale = img_res // grid
    oy, ox = ys // scale, xs // scale
    wy, wx = (ty // scale).astype(np.int64), (tx // scale).astype(np.int64)
    wy, wx = np.clip(wy, 0, grid - 1), np.clip(wx, 0, grid - 1)

    # unique coarse pairs + their fine-pixel multiplicities
    if len(oy):
        pairs, counts = np.unique(
            np.stack([oy, ox, wy, wx], axis=-1), axis=0, return_counts=True
        )
    else:
        pairs = np.zeros((0, 4), np.int64)
        counts = np.zeros((0,), np.int64)

    bg_orig = np.ones((grid, grid), bool)
    bg_trans = np.ones((grid, grid), bool)
    if len(pairs):
        bg_orig[pairs[:, 0], pairs[:, 1]] = False
        bg_trans[pairs[:, 2], pairs[:, 3]] = False

    n = min(len(pairs), max_pts)
    fg_o = np.full((max_pts, 2), grid, np.int32)
    fg_t = np.full((max_pts, 2), grid, np.int32)
    valid = np.zeros((max_pts,), np.float32)
    if n:
        fg_o[:n] = pairs[:n, 0:2]
        fg_t[:n] = pairs[:n, 2:4]
        valid[:n] = counts[:n]
    return {
        "fg_orig": fg_o, "fg_trans": fg_t, "fg_valid": valid,
        "bg_orig": bg_orig.astype(np.float32),
        "bg_trans": bg_trans.astype(np.float32),
    }


def foreground_loss(act, act_orig, fg_orig, fg_trans, fg_valid):
    """Paired activation match across the correspondence (losses.py:4-17,
    patch_size 1 -> direct paired gather).  act/act_orig [g, g, C];
    fg_valid carries the fine-pixel multiplicity of each coarse pair
    (0 = padding), so this count-weighted mean equals the reference's
    plain mean over ALL fine-pixel pairs — golden-pinned in
    tests/test_reference_golden_baselines2.py."""
    a_o = act_orig[fg_orig[:, 0], fg_orig[:, 1]]     # [N, C] (clip-gathered)
    a_t = act[fg_trans[:, 0], fg_trans[:, 1]]
    d = jnp.abs(a_o - a_t).mean(-1) * fg_valid
    return jnp.sum(d) / (jnp.sum(fg_valid) + 1e-10)


def background_loss(act, act_orig, bg_orig, bg_trans):
    """Global-average background match (losses.py:42-49,
    bg_loss_type='global_avg')."""
    m1 = bg_orig[..., None]
    m2 = bg_trans[..., None]
    f1 = jnp.sum(act_orig * m1, (0, 1)) / (jnp.sum(m1) + 1e-10)
    f2 = jnp.sum(act * m2, (0, 1)) / (jnp.sum(m2) + 1e-10)
    return jnp.abs(f1 - f2).mean()


# ---------------------------------------------------------------------------
# Null-text inversion (stable_null_inverter.py, compact)
# ---------------------------------------------------------------------------


def null_text_invert(pipe, latent, cond_ctx, steps: int,
                     guidance_scale: float = 7.5, iters: int = 10,
                     lr: float = 1e-2, depth_ch=None):
    """Per-step null-embedding optimization: make CFG sampling retrace the
    conditional DDIM inversion trajectory.  Returns (uncond_embs
    [steps, 77, D], trajectory [steps+1, ...])."""
    schedule = DDIMSchedule.create(num_inference_steps=steps)

    def unet(params, z, t, ctx):
        zin = z if depth_ch is None else jnp.concatenate(
            [z, depth_ch], axis=-1
        )
        return pipe.unet.apply(params["unet"], zin, t, ctx)

    @jax.jit
    def invert_scan(params, z0):
        def body(z, t):
            eps = unet(params, z, t, cond_ctx)
            z, _ = inv_step(schedule, eps, t, z)
            return z, z
        _, traj = jax.lax.scan(body, z0, jnp.flip(schedule.timesteps))
        return jnp.concatenate([z0[None], traj], axis=0)

    traj = invert_scan(pipe.params, latent)

    uncond0 = pipe.encode_text([""])

    @jax.jit
    def nti_scan(params, traj):
        def ddim_prev(eps, t, z):
            a_t = schedule.alpha_at(t)
            a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
            x0 = (z.astype(jnp.float32)
                  - jnp.sqrt(1.0 - a_t) * eps.astype(jnp.float32)
                  ) / jnp.sqrt(a_t)
            return jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps.astype(
                jnp.float32
            )

        def per_step(z, inp):
            t, target = inp

            def loss_fn(u_emb):
                eps_u = unet(params, z, t, u_emb)
                eps_c = unet(params, z, t, cond_ctx)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                return jnp.mean((ddim_prev(eps, t, z) - target) ** 2)

            def opt_body(_, u):
                g = jax.grad(loss_fn)(u)
                return u - lr * g

            u = jax.lax.fori_loop(0, iters, opt_body, uncond0)
            eps_u = unet(params, z, t, u)
            eps_c = unet(params, z, t, cond_ctx)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            z_next = ddim_prev(eps, t, z).astype(z.dtype)
            return z_next, u

        _, us = jax.lax.scan(
            per_step, traj[-1], (schedule.timesteps, traj[::-1][1:])
        )
        return us

    return nti_scan(pipe.params, traj), traj


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------


class DiffusionHandles:
    """Depth-guided activation editing over a FreeFine pipeline."""

    def __init__(self, pipe):
        self.pipe = pipe
        self._cache = {}
        cfg = pipe.config
        self.grid = cfg.latent_height          # activation grid = latent res
        self.use_depth = cfg.unet.in_channels == 5

    def _tap(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """Decoder layers 1-3 (the reference taps unet outputs 4-6),
        bilinear-resized to the latent grid, batch dropped."""
        g = self.grid
        out = []
        for f in feats[-3:]:
            r = jax.image.resize(
                f.astype(jnp.float32), (f.shape[0], g, g, f.shape[-1]),
                "bilinear",
            )
            out.append(r[0])
        return out

    def _unet(self, params, z, t, ctx, depth_ch, want_feats: bool):
        zin = z if depth_ch is None else jnp.concatenate([z, depth_ch], -1)
        return self.pipe.unet.apply(
            params["unet"], zin, t, ctx, return_features=want_feats
        )

    def _record_pass(self, steps: int):
        key = ("record", steps)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=steps)

        def run(params, z, cond_ctx, uncond_embs, depth_ch, gs):
            def body(z, inp):
                t, u_emb = inp
                _, feats = self._unet(params, z, t, cond_ctx, depth_ch, True)
                acts = self._tap(feats)
                eps_u = self._unet(params, z, t, u_emb, depth_ch, False)
                eps_c = self._unet(params, z, t, cond_ctx, depth_ch, False)
                eps = (eps_u + gs * (eps_c - eps_u)).astype(jnp.float32)
                a_t = schedule.alpha_at(t)
                a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
                x0 = (z.astype(jnp.float32) - jnp.sqrt(1.0 - a_t) * eps) / (
                    jnp.sqrt(a_t)
                )
                z = (jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps).astype(
                    z.dtype
                )
                return z, tuple(acts)

            z, acts = jax.lax.scan(
                body, z, (schedule.timesteps, uncond_embs)
            )
            return z, acts

        self._cache[key] = jax.jit(run)
        return self._cache[key]

    def _guided_pass(self, steps: int, num_optsteps: int,
                     guidance_max_step: int):
        key = ("guided", steps, num_optsteps, guidance_max_step)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=steps)

        def run(params, z, cond_ctx, uncond_embs, depth_ch, acts_orig,
                corr, fgw_sched, bgw_sched, gs):
            def body(carry, inp):
                z, = carry
                t, u_emb, acts_t, fgw_base, bgw_base = inp

                def loss_fn(z_opt, fgw, bgw):
                    _, feats = self._unet(
                        params, z_opt, t, cond_ctx, depth_ch, True
                    )
                    acts = self._tap(feats)
                    loss = jnp.float32(0.0)
                    for li in range(3):
                        loss = loss + fgw[li] * foreground_loss(
                            acts[li], acts_t[li], corr["fg_orig"],
                            corr["fg_trans"], corr["fg_valid"],
                        )
                        loss = loss + bgw[li] * background_loss(
                            acts[li], acts_t[li], corr["bg_orig"],
                            corr["bg_trans"],
                        )
                    return loss

                def opt_body(i, z_opt):
                    w = jnp.asarray(
                        [OPT_WEIGHTS[j % len(OPT_WEIGHTS)] for j in
                         range(num_optsteps)], jnp.float32
                    )[i]
                    fgw = fgw_base * w[0]
                    bgw = bgw_base * w[1]
                    g = jax.grad(loss_fn)(z_opt, fgw, bgw)
                    return z_opt - 0.1 * g.astype(z_opt.dtype)

                z = jax.lax.fori_loop(0, num_optsteps, opt_body, z)

                eps_u = self._unet(params, z, t, u_emb, depth_ch, False)
                eps_c = self._unet(params, z, t, cond_ctx, depth_ch, False)
                eps = (eps_u + gs * (eps_c - eps_u)).astype(jnp.float32)
                a_t = schedule.alpha_at(t)
                a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
                x0 = (z.astype(jnp.float32) - jnp.sqrt(1.0 - a_t) * eps) / (
                    jnp.sqrt(a_t)
                )
                z = (jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps).astype(
                    z.dtype
                )
                return (z,), None

            (z,), _ = jax.lax.scan(
                body, (z,),
                (schedule.timesteps, uncond_embs, acts_orig,
                 fgw_sched, bgw_sched),
            )
            return z

        self._cache[key] = jax.jit(run)
        return self._cache[key]

    def edit(
        self,
        image: np.ndarray,
        depth: np.ndarray,
        mask: np.ndarray,
        edit_param,
        prompt: str = "",
        steps: int = 50,
        fg_weight: float = 1.5,
        bg_weight: float = 1.25,
        num_optsteps: int = 3,
        guidance_max_step: Optional[int] = None,
        guidance_scale: float = 7.5,
        nti_iters: int = 10,
    ) -> np.ndarray:
        """3D-edit the masked object using its depth (9-param edit_param)."""
        pipe = self.pipe
        h, w = pipe.config.height, pipe.config.width
        g = self.grid
        if guidance_max_step is None:
            guidance_max_step = int(steps * 38 / 50)

        d = np.asarray(depth, np.float32)
        m01 = (np.asarray(mask) > 0)
        corr_map = np.asarray(
            compute_correspondence(d, m01, edit_param)
        )
        corr = {
            k: jnp.asarray(v)
            for k, v in process_correspondences(corr_map, h, grid=g).items()
        }

        depth_ch = None
        if self.use_depth:
            # edited disparity: infill the vacated hole (fast-marching in
            # place of the reference's Laplacian solve, diffusion_handles
            # .py:90-113), then carry the object's depth to its new
            # positions via the correspondence
            bg = np.asarray(
                inpaint_fmm(
                    jnp.asarray(d)[..., None], jnp.asarray(m01, jnp.float32)
                )
            )[..., 0]
            edited = bg.copy()
            ys, xs = np.nonzero(np.isfinite(corr_map[..., 0]))
            ty = np.clip(np.round(corr_map[ys, xs, 0]).astype(np.int64),
                         0, d.shape[0] - 1)
            tx = np.clip(np.round(corr_map[ys, xs, 1]).astype(np.int64),
                         0, d.shape[1] - 1)
            edited[ty, tx] = d[ys, xs]
            disp = 1.0 / np.maximum(edited, 1e-6)
            disp = (disp - disp.min()) / (disp.max() - disp.min() + 1e-8)
            depth_ch = jax.image.resize(
                jnp.asarray(disp * 2.0 - 1.0), (g, g), "bilinear"
            )[None, :, :, None]

        latent = pipe.image_to_latent(image)
        cond_ctx = pipe.encode_text([prompt])

        uncond_embs, traj = null_text_invert(
            pipe, latent, cond_ctx, steps,
            guidance_scale=guidance_scale, iters=nti_iters,
            depth_ch=depth_ch,
        )

        record = self._record_pass(steps)
        _, acts_orig = record(
            pipe.params, traj[-1], cond_ctx, uncond_embs, depth_ch,
            jnp.float32(guidance_scale),
        )

        i = np.arange(steps)
        on = (i < guidance_max_step).astype(np.float32)
        fgw = jnp.asarray((30.0 * fg_weight * on)[:, None]
                          * np.ones((1, 3), np.float32))
        bgw = jnp.asarray((30.0 * bg_weight * on)[:, None]
                          * np.ones((1, 3), np.float32))

        guided = self._guided_pass(steps, num_optsteps, guidance_max_step)
        z = guided(
            pipe.params, traj[-1], cond_ctx, uncond_embs, depth_ch,
            acts_orig, corr, fgw, bgw, jnp.float32(guidance_scale),
        )
        return pipe.latent_to_image(z)[0]
