"""GeoDiffuser baseline core, TPU-native.

Reimplements the editing method of evaluation/GeoDiffuser (reference:
GeoDiffuser/utils/editor.py:65-420 + attention_processors.py:377-740) on
the freefine_tpu stack: optimization-based geometric editing through
attention sharing.

  1. DDIM-invert the image (unconditional, the eval uses prompt "").
  2. Denoise a [base, edit] 2-stream batch whose every attention layer
     runs `EditConfig(mode="geodiff")`: the edit stream's output is the
     warped-base-query reference inside the moved object, its live
     attention elsewhere, and the layer sows preservation / placement /
     removal / smoothness losses (ops/attention.geodiff_attention).
  3. During the first `optimize_steps` fraction, each step first takes a
     gradient of the summed sown losses w.r.t. the edit latent
     (lr 0.03, editor.py:139,240-330); the base stream is pinned to the
     inversion trajectory for the first `latent_replace` fraction.

GeoBench 2D defaults (eval_geobench.py:73): 50 steps, lr 0.03,
optimize_steps 0.95, latent_replace 0.6, sharing window 0.97, loss
weights movement 6.5/3.34, sim 0.74/0.5, removal 4.34/2.67 (self/cross),
smoothness 0.  The reference's adaptive per-step removal-weight
controller (optimization.adaptive_optimization_step_editing, invoked at
editor.py:286-293) runs as a traced in-scan multiplier update — see
`adaptive_removal_schedule`.  The reference's 3D path warps by depth-based splatting;
this core takes any dense warp grid — the analytic 2D affine here,
`ops.point_splat.compute_correspondence` for 3D.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.edit import (
    EditConfig,
    EditState,
    attention_resolutions,
    build_mask_pyramid,
)
from freefine_tpu.ops.geometry import (
    edit_affine_matrix,
    invert_affine,
    mask_bbox_center,
)
from freefine_tpu.schedulers.ddim import DDIMSchedule

LOSS_WEIGHTS = {
    # (self, cross) weights, eval_geobench.py:74
    "sim": (0.74, 0.5),
    "movement": (6.5, 3.34),
    "removal": (4.34, 2.67),
    "smooth": (0.0, 0.0),
    "amodal": (80.5, 3.5),
}


def warp_coord_pyramid(
    matrix: np.ndarray, latent_h: int, latent_w: int
) -> Dict[int, jnp.ndarray]:
    """Inverse-warp grids {seq: [h, w, 2]} of (y, x) source coords per
    attention resolution, from a full-res 2x3 affine edit matrix."""
    inv = invert_affine(np.asarray(matrix, np.float64))
    out = {}
    for h, w in attention_resolutions(latent_h, latent_w):
        sy, sx = latent_h / h, latent_w / w
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        # to full-res pixel coords (latent scale x8 cancels in the affine)
        fx = (xs + 0.5) * sx * 8.0
        fy = (ys + 0.5) * sy * 8.0
        src_x = inv[0, 0] * fx + inv[0, 1] * fy + inv[0, 2]
        src_y = inv[1, 0] * fx + inv[1, 1] * fy + inv[1, 2]
        grid = np.stack([src_y / (sy * 8.0) - 0.5,
                         src_x / (sx * 8.0) - 0.5], -1)
        out[h * w] = jnp.asarray(grid, jnp.float32)
    return out


def warp_mask(mask: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    """Forward-warp a full-res 0/1 mask by the 2x3 affine (binarised)."""
    h, w = mask.shape
    inv = invert_affine(np.asarray(matrix, np.float64))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    ix = np.clip(np.round(sx).astype(np.int64), 0, w - 1)
    iy = np.clip(np.round(sy).astype(np.int64), 0, h - 1)
    inside = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    return ((mask[iy, ix] > 0.5) & inside).astype(np.float32)


def _sum_geodiff_losses(
    inters, place_weights=LOSS_WEIGHTS, removal_self_mult=1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flatten sown geodiff_* intermediates and apply the self/cross loss
    weights (self-attn paths contain 'attn1').

    Returns (weighted_total, raw_removal_self): the unweighted self-attn
    removal-loss sum is what the reference logs as
    loss_log_dict["self"]["removal"] (attention_processors.py:606-608) and
    feeds the adaptive controller.  `removal_self_mult` scales the SELF
    removal weight only — the single entry
    adaptive_optimization_step_editing mutates (optimization.py:36-47)."""
    total = jnp.float32(0.0)
    removal_self = jnp.float32(0.0)

    def walk(tree, path):
        nonlocal total, removal_self
        if isinstance(tree, dict):
            for kk, vv in tree.items():
                walk(vv, path + "/" + kk)
        elif isinstance(tree, (tuple, list)):
            for vv in tree:
                walk(vv, path)
        else:
            for name, (w_self, w_cross) in place_weights.items():
                if path.endswith("geodiff_" + name):
                    is_self = "attn1" in path
                    w = w_self if is_self else w_cross
                    if name == "removal" and is_self:
                        w = w * removal_self_mult
                        removal_self = removal_self + tree
                    total = total + w * tree
    walk(inters, "")
    return total, removal_self


def adaptive_removal_schedule(
    steps: int, skip: int = 1, removal_in: float = -1.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side per-step (phase, expected-loss) arrays for the adaptive
    removal-weight controller (optimization.py:
    adaptive_optimization_step_editing).

    phase 0 (i/N < 0.4): expected = removal_in / 1.25^remaining with
    remaining = int((0.4 - i/N) * N / skip); weight *= 1.3 when the logged
    self-removal loss sits above the target, /= 2 when far below it.
    phase 1 (0.4 < i/N < 0.8): weight *= 2 while loss > removal_in - 0.3,
    else reset.  phase 2 (i/N == 0.4 or >= 0.8): reset to the defaults —
    which the eval sets to the GeoBench table itself (editor.py:636-638),
    so reset == multiplier 1."""
    i = np.arange(steps)
    p = i / steps
    phase = np.where(p < 0.4, 0, np.where((p > 0.4) & (p < 0.8), 1, 2))
    remaining = ((0.4 - p) * steps / skip).astype(np.int64)
    expected = removal_in / (1.25 ** np.maximum(remaining, 0))
    return phase.astype(np.int32), expected.astype(np.float32)


class GeoDiffuser:
    """Attention-optimization geometric editing over a FreeFine pipeline."""

    def __init__(self, pipe):
        self.pipe = pipe
        self._cache = {}

    def _loop(self, steps: int, lr: float):
        key = ("loop", steps, lr)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        cfg = pipe.config
        schedule = DDIMSchedule.create(num_inference_steps=steps)
        # losses at the top two attention grids, removal at the second —
        # the reference's hw >= 32^2 gate at SD's 64^2 latent, expressed
        # relative to the configured latent size
        loss_seq = (cfg.latent_height * cfg.latent_width) // 4
        ecfg = EditConfig(mode="geodiff", method=None, local_cfg=False,
                          num_streams=2, geodiff_loss_seq=loss_seq)

        def unet_losses(params, pair, t, ctx2, state, rem_mult):
            eps, inters = pipe.unet.apply(
                params["unet"], pair, t, ctx2,
                edit_cfg=ecfg, edit_state=state,
                mutable=["intermediates"],
            )
            total, removal_self = _sum_geodiff_losses(
                inters, removal_self_mult=rem_mult
            )
            return eps, total, removal_self

        def run(params, lat2, ctx2, state, traj, gates, lr_sched, m_warp_lat,
                adapt_sched, removal_in):
            """lat2 [2, lh, lw, 4] = [base, edit]; gates [steps, 3] =
            (optimize, share, pin); traj [steps+1, 1, ...]; lr_sched
            [steps] decaying step sizes; m_warp_lat [lh, lw] warped mask;
            adapt_sched [steps, 3] = (enabled, phase, expected) for the
            adaptive removal-weight controller."""
            mw = m_warp_lat[None, :, :, None]

            def body(carry, inp):
                lat, rem_mult = carry
                t, g, tgt_base, l_eff, ad = inp
                g_opt, g_share, g_pin = g[0], g[1], g[2]
                st = EditState(
                    fg_retain=state.fg_retain, fg_ref=state.fg_ref,
                    local_region=state.local_region,
                    warp_coords=state.warp_coords,
                    share_gate=g_share,
                )
                lat = lat.at[0:1].set(
                    jnp.where(g_pin > 0, tgt_base, lat[0:1])
                )

                # latent optimization on the edit stream (editor.py:240-330):
                # double step inside the warped region (_update_latent,
                # optimization.py:226-237), NaN-guarded, norm-preserving
                def loss_of(z_edit):
                    pair = jnp.concatenate([lat[0:1], z_edit], axis=0)
                    _, loss, removal = unet_losses(
                        params, pair, t, ctx2, st, rem_mult
                    )
                    return loss, removal

                grad, removal = jax.grad(loss_of, has_aux=True)(lat[1:2])
                grad = jnp.nan_to_num(grad, posinf=0.0, neginf=0.0, nan=0.0)
                z_old = lat[1:2].astype(jnp.float32)
                step = g_opt * l_eff * (1.0 + mw)
                z_new = z_old - step * grad.astype(jnp.float32)
                z_new = z_new * (
                    jnp.linalg.norm(z_old) / (jnp.linalg.norm(z_new) + 1e-12)
                )
                lat = lat.at[1:2].set(z_new.astype(lat.dtype))

                # adaptive removal-weight controller (optimization.py:
                # adaptive_optimization_step_editing, invoked right after
                # the optimization step at editor.py:284-293); active only
                # on optimization steps
                ad_on, phase, expected = ad[0], ad[1], ad[2]
                m0 = jnp.where(
                    removal > expected, rem_mult * 1.3,
                    jnp.where(2.5 * expected > removal, rem_mult / 2.0,
                              rem_mult),
                )
                m1 = jnp.where(removal > removal_in - 0.3,
                               rem_mult * 2.0, 1.0)
                new_mult = jnp.where(
                    phase == 0, m0, jnp.where(phase == 1, m1, 1.0)
                )
                rem_mult = jnp.where(
                    (ad_on > 0) & (g_opt > 0), new_mult, rem_mult
                )

                # the actual denoise step with attention sharing
                eps, _, _ = unet_losses(params, lat, t, ctx2, st, rem_mult)
                a_t = schedule.alpha_at(t)
                a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
                x32 = lat.astype(jnp.float32)
                e32 = eps.astype(jnp.float32)
                x0 = (x32 - jnp.sqrt(1.0 - a_t) * e32) / jnp.sqrt(a_t)
                lat = (jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * e32).astype(
                    lat.dtype
                )
                return (lat, rem_mult), rem_mult

            # base-stream pin target at step i = inversion latent at the
            # CURRENT noise level, traj[steps - i]
            (lat, _), mults = jax.lax.scan(
                body, (lat2, jnp.float32(1.0)),
                (schedule.timesteps, gates, traj[::-1][:-1], lr_sched,
                 adapt_sched),
            )
            return lat, mults

        self._cache[key] = jax.jit(run)
        return self._cache[key]

    def edit(
        self,
        image: np.ndarray,
        mask: np.ndarray,
        edit_param,
        prompt: str = "",
        steps: int = 50,
        lr: float = 0.03,
        optimize_steps: float = 0.95,
        latent_replace: float = 0.6,
        share_steps: float = 0.97,
        adaptive: bool = True,
        removal_loss_value: float = -1.5,
        seed: int = 42,
    ) -> np.ndarray:
        """Geometric edit via the GeoBench 9-param edit_param (2D affine)."""
        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        h, w = cfg.height, cfg.width

        m = (np.asarray(mask) > 0).astype(np.float32)
        p = list(map(float, edit_param))
        matrix = edit_affine_matrix(
            mask_bbox_center(m), p[0], p[1], p[5],
            p[6] if p[6] else 1.0, p[7] if p[7] else 1.0,
        )
        m_warp = warp_mask(m, matrix)

        # amodal ring: the dilated warped-object boundary minus the warped
        # object (attention_processors.py:347-348)
        from freefine_tpu.masks import dilate

        ring = np.clip(
            np.asarray(dilate(jnp.asarray(m_warp), max(h // 32, 2)))
            - m_warp, 0.0, 1.0,
        )
        state = EditState(
            fg_ref=build_mask_pyramid(jnp.asarray(m), lh, lw),
            fg_retain=build_mask_pyramid(jnp.asarray(m_warp), lh, lw),
            local_region=build_mask_pyramid(jnp.asarray(ring), lh, lw),
            warp_coords=warp_coord_pyramid(matrix, lh, lw),
        )

        latent = pipe.image_to_latent(image)
        traj = pipe.invert(latent, steps, 0)

        ctx = pipe.encode_text([prompt])
        ctx2 = jnp.concatenate([ctx, ctx], axis=0)

        n = steps
        i = np.arange(n)
        gates = np.stack([
            i < optimize_steps * n,
            i < share_steps * n,
            i < latent_replace * n,
        ], axis=1).astype(np.float32)

        # decaying effective step: lr * (N - i) * 50/N (editor.py:207)
        lr_sched = (lr * (n - i) * (50.0 / n)).astype(np.float32)
        m_warp_lat = jax.image.resize(
            jnp.asarray(m_warp), (lh, lw), "nearest"
        )

        phase, expected = adaptive_removal_schedule(
            steps, removal_in=removal_loss_value
        )
        adapt_sched = np.stack([
            np.full(steps, 1.0 if adaptive else 0.0, np.float32),
            phase.astype(np.float32),
            expected,
        ], axis=1)

        run = self._loop(steps, float(lr))
        lat2 = jnp.concatenate([traj[-1], traj[-1]], axis=0)
        out, _ = run(pipe.params, lat2, ctx2, state, traj,
                     jnp.asarray(gates), jnp.asarray(lr_sched), m_warp_lat,
                     jnp.asarray(adapt_sched),
                     jnp.float32(removal_loss_value))
        return pipe.latent_to_image(out[1:2])[0]
