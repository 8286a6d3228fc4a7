"""RegionDrag baseline core, TPU-native.

Reimplements the editing method of evaluation/RegionDrag (reference:
region_utils/drag.py:159-284 + region_utils/cycle_sde.py:75-167) on the
freefine_tpu stack:

  1. Cycle-SDE forward: noise the encoded latent up step by step, recovering
     at each step the exact noise that makes the reverse SDE step reproduce
     the forward trajectory (cycle consistency, cycle_sde.py:132-150).
  2. Region copy-paste: dense source->target point correspondence from a
     region pair (`region_pair_to_pts`, region_utils/ui_utils.py:142-188);
     latent values are copied source->target at every reverse step
     (drag.py:103-113,146-157).
  3. Self-attention K/V replay: the reverse steps run the UNet with the K/V
     recorded during the forward pass (drag.py:195-215).

TPU-first design differences:
  * Both loops are single `lax.scan`s; points are fixed-size padded arrays
    (pad rows scatter out of bounds and are dropped) so one compiled graph
    serves every case.
  * K/V are never stored: the forward-trajectory latent at the matching
    timestep rides along as a second batch stream and every self-attention
    layer gathers its K/V from that stream (`EditConfig(mode="drag")`).
    Recomputing K/V from the identical input is exact, costs one extra
    UNet stream instead of O(steps x layers) HBM, and keeps the reverse
    loop scannable.
  * Timesteps use the framework's DDIM "leading" grid (981, 961, ... 1).
    The reference wires a DPMSolverMultistepScheduler purely as a timestep
    source (linspace grid); the cycle-SDE math itself (which this module
    reproduces exactly) is scheduler-agnostic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.edit import EditConfig
from freefine_tpu.schedulers.ddim import DDIMSchedule


# ---------------------------------------------------------------------------
# Region -> point correspondence (host side, numpy)
# ---------------------------------------------------------------------------


def _masked_min_max(values, mask, axis=None):
    v_min = np.min(np.where(mask, values, np.inf), axis=axis)
    v_max = np.max(np.where(mask, values, -np.inf), axis=axis)
    return v_min, v_max


def _resize_mask(mask: np.ndarray, scale: float) -> np.ndarray:
    h, w = mask.shape
    nh, nw = int(h * scale), int(w * scale)
    ys = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
    return mask[ys][:, xs]


def region_pair_to_pts(
    src_region: np.ndarray, trg_region: np.ndarray, scale: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense mapping between a source (handle) and a target region.

    Port of region_utils/ui_utils.py:142-188: normalise the target region's
    x-extent onto the source's, then per-column its y-extent, yielding for
    every target pixel a matched source pixel.  Returns (source_pts,
    target_pts) as int [N, 2] arrays in (x, y) order.  `scale=1/8` maps in
    SD latent space.
    """
    src = _resize_mask(np.asarray(src_region), scale).astype(bool)
    trg = _resize_mask(np.asarray(trg_region), scale).astype(bool)
    h, w = src.shape
    if not src.any() or not trg.any():
        return np.zeros((0, 2), np.int64), np.zeros((0, 2), np.int64)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    trg_pts = np.stack([xs[trg], ys[trg]], axis=-1)

    src_x_min, src_x_max = _masked_min_max(xs, src)
    trg_x_min, trg_x_max = _masked_min_max(xs, trg)
    scale_x = (src_x_max - src_x_min) / max(trg_x_max - trg_x_min, 1e-4)
    map_x = (xs - trg_x_min) * scale_x + src_x_min
    map_x = np.where(trg, map_x, 0.0)

    # per-column y extents; src columns indexed by the remapped x
    src_y_min, src_y_max = _masked_min_max(ys, src, axis=0)
    trg_y_min, trg_y_max = _masked_min_max(ys, trg, axis=0)
    col = np.clip(map_x.astype(np.int64), 0, w - 1)
    s_min, s_max = src_y_min[col], src_y_max[col]
    # empty source columns (inf) can only be hit by rounding at the region
    # border; fall back to the global source extent there
    g_min, g_max = _masked_min_max(ys, src)
    s_min = np.where(np.isfinite(s_min), s_min, g_min)
    s_max = np.where(np.isfinite(s_max), s_max, g_max)
    t_min = np.where(np.isfinite(trg_y_min), trg_y_min, 0.0)
    t_max = np.where(np.isfinite(trg_y_max), trg_y_max, 0.0)

    scale_y = (s_max - s_min) / np.maximum(t_max - t_min, 1e-4)
    map_y = (ys - t_min) * scale_y + s_min
    src_pts = np.stack([map_x[trg], map_y[trg]], axis=-1)

    src_pts = np.clip(src_pts, 0, [w - 1, h - 1]).astype(np.int64)
    return src_pts, trg_pts.astype(np.int64)


def pad_points(pts: np.ndarray, n: int, oob: int) -> np.ndarray:
    """Pad/truncate [N, 2] points to [n, 2]; pad rows get the out-of-bounds
    index `oob` so scatters with mode='drop' ignore them."""
    out = np.full((n, 2), oob, np.int32)
    m = min(len(pts), n)
    if m:
        out[:m] = pts[:m]
    return out


# ---------------------------------------------------------------------------
# Cycle-SDE steps (pure functions over the DDIM schedule tables)
# ---------------------------------------------------------------------------


def _alpha(schedule: DDIMSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t] with initial/final fallback 1.0 for t outside the
    trained range (cycle_sde.py:84-85: both boundary alphas are 1.0)."""
    safe = jnp.clip(t, 0, schedule.num_train_timesteps - 1)
    return jnp.where(
        (t >= 0) & (t < schedule.num_train_timesteps),
        schedule.alphas_cumprod[safe],
        jnp.float32(1.0),
    )


def forward_sde_step(
    schedule: DDIMSchedule,
    eps_fn,
    t: jnp.ndarray,
    x: jnp.ndarray,
    rng: jax.Array,
    eta: float = 1.0,
):
    """x at t -> x at t+delta, plus the recovered cycle noise.

    Reference Sampler.forward_sde (cycle_sde.py:132-150): jump up with fresh
    gaussian noise, then solve for the noise that makes the reverse SDE step
    from x_{t+delta} land exactly on x_t.
    """
    t_next = t + schedule.step_delta
    a_t = _alpha(schedule, t)
    a_n = _alpha(schedule, t_next)
    x32 = x.astype(jnp.float32)

    z = jax.random.normal(rng, x.shape, jnp.float32)
    x_next = jnp.sqrt(a_n / a_t) * x32 + jnp.sqrt(1.0 - a_n / a_t) * z

    eps = eps_fn(x_next.astype(x.dtype), t_next).astype(jnp.float32)

    sigma = eta * jnp.sqrt((1.0 - a_t) / (1.0 - a_n)) * jnp.sqrt(1.0 - a_n / a_t)
    x0 = (x_next - jnp.sqrt(1.0 - a_n) * eps) / jnp.sqrt(a_n)
    dir_coeff = jnp.sqrt(1.0 - a_t - sigma**2)
    noise = (x32 - jnp.sqrt(a_t) * x0 - dir_coeff * eps) / sigma
    return x_next.astype(x.dtype), noise


def forward_ode_step(schedule: DDIMSchedule, eps_fn, t: jnp.ndarray, x: jnp.ndarray):
    """Deterministic DDIM inversion step x_t -> x_{t+delta}
    (cycle_sde.py:152-167)."""
    t_next = t + schedule.step_delta
    a_t = _alpha(schedule, t)
    a_n = _alpha(schedule, t_next)
    x32 = x.astype(jnp.float32)
    eps = eps_fn(x, t).astype(jnp.float32)
    x0 = (x32 - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    x_next = jnp.sqrt(a_n) * x0 + jnp.sqrt(1.0 - a_n) * eps
    return x_next.astype(x.dtype), jnp.zeros_like(x32)


def reverse_step(
    schedule: DDIMSchedule,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    x: jnp.ndarray,
    noise: jnp.ndarray,
    sde: bool,
    eta: float = 1.0,
) -> jnp.ndarray:
    """One reverse step x_t -> x_{t-delta} (cycle_sde.py:112-130), with the
    injected `noise` being the recovered cycle noise when sde=True."""
    t_prev = t - schedule.step_delta
    a_t = _alpha(schedule, t)
    a_p = _alpha(schedule, t_prev)
    x32 = x.astype(jnp.float32)
    eps = eps.astype(jnp.float32)

    sigma = (
        eta * jnp.sqrt((1.0 - a_p) / (1.0 - a_t)) * jnp.sqrt(1.0 - a_t / a_p)
        if sde else jnp.float32(0.0)
    )
    x0 = (x32 - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    x_prev = jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p - sigma**2) * eps
    if sde:
        x_prev = x_prev + sigma * noise.astype(jnp.float32)
    return x_prev.astype(x.dtype)


# ---------------------------------------------------------------------------
# Latent point ops
# ---------------------------------------------------------------------------


def copy_paste(
    src_latent: jnp.ndarray, dst_latent: jnp.ndarray,
    src_pts: jnp.ndarray, tgt_pts: jnp.ndarray,
) -> jnp.ndarray:
    """dst[tgt] <- src[src] for [N, 2] (x, y) point lists (drag.py:103-113).
    NHWC latents; padded (out-of-bounds) target rows are dropped."""
    vals = src_latent[0, src_pts[:, 1], src_pts[:, 0], :]
    return dst_latent.at[0, tgt_pts[:, 1], tgt_pts[:, 0], :].set(
        vals, mode="drop"
    )


def blur_points(
    latent: jnp.ndarray, pts: jnp.ndarray, noise_scale: float, rng: jax.Array
) -> jnp.ndarray:
    """Re-noise the latent at `pts` (drag.py:115-119): erases the source
    region's content so the reverse process must resynthesise it."""
    img_scale = (1.0 - noise_scale**2) ** 0.5 if noise_scale < 1 else 0.0
    vals = latent[0, pts[:, 1], pts[:, 0], :]
    noise = jax.random.normal(rng, vals.shape, jnp.float32)
    new = (img_scale * vals.astype(jnp.float32) + noise_scale * noise).astype(
        latent.dtype
    )
    return latent.at[0, pts[:, 1], pts[:, 0], :].set(new, mode="drop")


# ---------------------------------------------------------------------------
# The drag pipeline
# ---------------------------------------------------------------------------


class RegionDrag:
    """Region-based drag editing over a FreeFine pipeline's SD backbone.

    `method` mirrors the reference options (drag.py:190-232):
      * 'encode_then_cp' (default, SDE): noise the original latent up,
        copy-paste in latent space at every reverse step.
      * 'cp_then_encode' (ODE): build a pixel-space copy-paste preview,
        invert it deterministically for the trajectory/K-V streams, start
        the reverse pass from the original image's inverted latent.
    """

    def __init__(self, pipe):
        self.pipe = pipe
        self._cache = {}

    # -- jitted stages -------------------------------------------------------

    def _loops(self, steps: int, k: int, sde: bool, max_pts: int,
               ip_scale: float = 0.0):
        key = (steps, k, sde, max_pts, ip_scale)
        if key in self._cache:
            return self._cache[key]

        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=steps)
        ecfg = EditConfig(mode="drag", method=None, local_cfg=False,
                          num_streams=2, kv_source_stream=1,
                          layer_range=(0, 10**6),
                          tca_scope=("down", "mid", "up"),
                          ip_scale=ip_scale)
        plain_cfg = EditConfig(mode="none", method=None, local_cfg=False,
                               ip_scale=ip_scale)
        # ascending timesteps of the forward pass: the LAST k entries of the
        # descending DDIM grid, flipped (drag.py:139)
        ts_fwd = schedule.timesteps[steps - k:][::-1]
        # reverse pass visits the same latents top-down (drag.py:152)
        ts_bwd = ts_fwd[::-1] + schedule.step_delta

        def eps_plain(params, x, t, ctx, ctx_img):
            return pipe.unet.apply(params["unet"], x, t, ctx,
                                   edit_cfg=plain_cfg,
                                   context_image=ctx_img)

        def forward(params, latent, ctx, rng, ctx_img=None):
            def body(carry, inp):
                x, rng = carry
                t = inp
                rng, r = jax.random.split(rng)
                if sde:
                    x_next, noise = forward_sde_step(
                        schedule,
                        lambda z, tt: eps_plain(params, z, tt, ctx, ctx_img),
                        t, x, r,
                    )
                else:
                    x_next, noise = forward_ode_step(
                        schedule,
                        lambda z, tt: eps_plain(params, z, tt, ctx, ctx_img),
                        t, x,
                    )
                return (x_next, rng), (x_next, noise)

            (_, _), (hooks, noises) = jax.lax.scan(
                body, (latent, rng), ts_fwd
            )
            return hooks, noises

        def backward(params, start_latent, hooks, noises, ctx,
                     src_pts, tgt_pts, cp_gates, mask, ctx_img=None):
            ctx_img2 = (
                None if ctx_img is None
                else jnp.concatenate([ctx_img, ctx_img], axis=0)
            )

            def body(x, inp):
                hook, noise, t, cp_gate = inp
                x_cp = copy_paste(hook, x, src_pts, tgt_pts)
                x = jnp.where(cp_gate > 0, x_cp, x)
                x = jnp.where(mask > 0, x, hook)
                pair = jnp.concatenate([x, hook], axis=0)
                eps2 = pipe.unet.apply(
                    params["unet"], pair, t,
                    jnp.concatenate([ctx, ctx], axis=0),
                    edit_cfg=ecfg, context_image=ctx_img2,
                )
                x = reverse_step(schedule, eps2[:1], t, x, noise, sde=sde)
                return x, None

            # hooks/noises are stacked in forward (ascending) order; the
            # reverse pass consumes them top-down
            xs = (hooks[::-1], noises[::-1], ts_bwd, cp_gates)
            out, _ = jax.lax.scan(body, start_latent, xs)
            return out

        fwd = jax.jit(forward)
        bwd = jax.jit(backward)
        # case-batched variants (drag_batch): params broadcast, everything
        # per-case vmapped; IP-adapter conditioning stays batch-1 only
        fwd_b = jax.jit(jax.vmap(
            lambda p, lat, ctx, rng: forward(p, lat, ctx, rng, None),
            in_axes=(None, 0, 0, 0),
        ))
        bwd_b = jax.jit(jax.vmap(
            lambda p, sl, hk, nz, ctx, sp, tp, gates, mask: backward(
                p, sl, hk, nz, ctx, sp, tp, gates, mask, None
            ),
            in_axes=(None, 0, 0, 0, 0, 0, 0, None, 0),
        ))
        self._cache[key] = (schedule, ts_bwd, fwd, bwd, fwd_b, bwd_b)
        return self._cache[key]

    # -- public API ------------------------------------------------------------

    def drag(
        self,
        ori_image: np.ndarray,
        source_pts: np.ndarray,
        target_pts: np.ndarray,
        prompt: str,
        mask: Optional[np.ndarray] = None,
        steps: int = 50,
        start_t: float = 0.5,
        end_t: float = 0.2,
        noise_scale: float = 1.0,
        seed: int = 42,
        method: str = "encode_then_cp",
        preview_image: Optional[np.ndarray] = None,
        max_pts: Optional[int] = None,
        image_tokens: Optional[jnp.ndarray] = None,
        ip_scale: float = 0.0,
    ) -> np.ndarray:
        """Drag-edit `ori_image` moving `source_pts` to `target_pts`
        (image-space (x, y) ints).  Defaults are the reference GeoBench
        settings (eval_geobench.py:80-84: 50 steps, start 0.5, end 0.2,
        noise_scale 1.0, cfg 1).
        """
        assert method in ("encode_then_cp", "cp_then_encode"), method
        sde = method == "encode_then_cp"
        pipe = self.pipe
        h, w = ori_image.shape[:2]
        lh, lw = pipe.config.latent_height, pipe.config.latent_width
        k = int(start_t * steps)
        end_step_t = int(end_t * steps)

        src = np.asarray(source_pts) // 8
        tgt = np.asarray(target_pts) // 8
        n_pts = max_pts or int(2 ** np.ceil(np.log2(max(len(tgt), 1))))
        oob = max(lh, lw)  # scatter-dropped padding index

        rng = jax.random.key(seed)
        rng, r_fwd, r_blur = jax.random.split(rng, 3)

        latent = pipe.image_to_latent(ori_image)
        ctx = pipe.encode_text([prompt])
        if image_tokens is not None and ip_scale <= 0:
            ip_scale = 0.5  # the reference's ip-adapter-plus scale
        tok = image_tokens

        schedule, ts_bwd, fwd, bwd, _, _ = self._loops(
            steps, k, sde, n_pts, ip_scale if tok is not None else 0.0
        )

        if sde:
            blur = pad_points(src, n_pts, oob)
            copy_src = pad_points(src, n_pts, oob)
            hooks, noises = fwd(pipe.params, latent, ctx, r_fwd, tok)
            start_latent = hooks[-1]
        else:
            # preview trajectory provides the hook latents; the original
            # image's inverted latent is the reverse starting point
            # (drag.py:222-232,264-273)
            preview = preview_image if preview_image is not None else ori_image
            prev_latent = pipe.image_to_latent(preview)
            hooks, noises = fwd(pipe.params, prev_latent, ctx, r_fwd, tok)
            start_latent = fwd(pipe.params, latent, ctx, r_fwd, tok)[0][-1]
            blur = pad_points(np.concatenate([tgt, src]), 2 * n_pts, oob)
            copy_src = pad_points(tgt, n_pts, oob)
        paste_tgt = pad_points(tgt, n_pts, oob)

        start_latent = blur_points(start_latent, blur, noise_scale, r_blur)

        # copy-paste is active while t >= end_t * steps — the reference
        # compares the raw timestep against the *step index* bound
        # (drag.py:154), reproduced as-is
        cp_gates = (np.asarray(ts_bwd) >= end_step_t).astype(np.float32)

        if mask is None:
            mask_l = jnp.ones((1, lh, lw, 1), jnp.float32)
        else:
            m = jax.image.resize(
                jnp.asarray(mask, jnp.float32), (lh, lw), "nearest"
            )
            mask_l = m[None, :, :, None]

        out_latent = bwd(
            pipe.params, start_latent, hooks, noises, ctx,
            copy_src, paste_tgt, jnp.asarray(cp_gates), mask_l, tok,
        )
        image = pipe.latent_to_image(out_latent)[0]

        if mask is not None and not np.all(np.asarray(mask) > 0):
            m = np.asarray(mask, bool)[:, :, None]
            image = np.where(m, image, ori_image[..., :3])
        return image

    def drag_regions(
        self,
        ori_image: np.ndarray,
        src_region: np.ndarray,
        trg_region: np.ndarray,
        prompt: str,
        **kwargs,
    ) -> np.ndarray:
        """GeoBench entry: dense region pair -> points -> drag
        (eval_geobench.py:102-120)."""
        src, tgt = region_pair_to_pts(src_region, trg_region, scale=1 / 8)
        return self.drag(
            ori_image, src * 8, tgt * 8, prompt, **kwargs
        )

    def drag_batch(
        self,
        items,                     # [{ori_image, source_pts, target_pts,
                                   #   mask?}, ...]
        prompts,                   # one prompt per item
        steps: int = 50,
        start_t: float = 0.5,
        end_t: float = 0.2,
        noise_scale: float = 1.0,
        seed: int = 42,
        max_pts: Optional[int] = None,
    ) -> list:
        """Case-batched SDE drag — BEYOND the reference's hard batch-1
        limit (eval_geobench.py runs one case at a time): the whole
        forward-noise + copy-paste-reverse pipeline vmaps over cases
        because every per-case quantity (points padded to a common count,
        masks, RNG keys, text context) is data, not module state.

        Same math as `drag(method='encode_then_cp')` per item; returns a
        list of edited uint8 images."""
        pipe = self.pipe
        lh, lw = pipe.config.latent_height, pipe.config.latent_width
        nb = len(items)
        assert nb == len(prompts)
        k = int(start_t * steps)
        end_step_t = int(end_t * steps)
        oob = max(lh, lw)

        n_pts = max_pts or int(2 ** np.ceil(np.log2(max(
            max(len(np.asarray(it["target_pts"])) for it in items), 1
        ))))

        schedule, ts_bwd, _, _, fwd_b, bwd_b = self._loops(
            steps, k, True, n_pts, 0.0
        )

        # ONE batched VAE encode ([B,H,W,3] -> [B,lh,lw,4]) instead of B
        # per-item device calls — same pattern as BatchedFreeFine
        lat = pipe.image_to_latent(
            np.stack([np.asarray(it["ori_image"]) for it in items])
        )[:, None]                                     # [B, 1, lh, lw, 4]
        ctx = pipe.encode_text(list(prompts))[:, None]  # [B, 1, 77, D]

        src = np.stack([
            pad_points(np.asarray(it["source_pts"]) // 8, n_pts, oob)
            for it in items
        ])
        tgt = np.stack([
            pad_points(np.asarray(it["target_pts"]) // 8, n_pts, oob)
            for it in items
        ])

        if isinstance(seed, (list, tuple, np.ndarray)):
            # per-case seeds: case i draws the exact keys `drag(seed[i])`
            # would — outputs independent of batch composition
            assert len(seed) == nb, (len(seed), nb)
            keys = [jax.random.split(jax.random.key(int(s)), 3)[1:]
                    for s in seed]
            rngs_fwd = jnp.stack([k[0] for k in keys])
            rngs_blur = jnp.stack([k[1] for k in keys])
        else:
            rng = jax.random.key(seed)
            r_fwd, r_blur = jax.random.split(rng)
            rngs_fwd = jax.random.split(r_fwd, nb)
            rngs_blur = jax.random.split(r_blur, nb)

        hooks, noises = fwd_b(pipe.params, lat, ctx, rngs_fwd)
        start_latent = jax.vmap(blur_points, in_axes=(0, 0, None, 0))(
            hooks[:, -1], jnp.asarray(src), noise_scale, rngs_blur
        )

        cp_gates = (np.asarray(ts_bwd) >= end_step_t).astype(np.float32)
        masks = []
        for it in items:
            m = it.get("mask")
            if m is None:
                masks.append(jnp.ones((1, lh, lw, 1), jnp.float32))
            else:
                masks.append(jax.image.resize(
                    jnp.asarray(m, jnp.float32), (lh, lw), "nearest"
                )[None, :, :, None])
        mask_b = jnp.stack(masks)

        out = bwd_b(
            pipe.params, start_latent, hooks, noises, ctx,
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(cp_gates),
            mask_b,
        )                                              # [B, 1, lh, lw, 4]
        images = pipe.latent_to_image(out[:, 0])
        outs = []
        for i, it in enumerate(items):
            img = images[i]
            m = it.get("mask")
            if m is not None and not np.all(np.asarray(m) > 0):
                mm = np.asarray(m, bool)[:, :, None]
                img = np.where(mm, img, it["ori_image"][..., :3])
            outs.append(img)
        return outs
