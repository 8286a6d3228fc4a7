"""Self-Guidance baseline core, TPU-native.

Reimplements the editing method of evaluation/SelfGuidance (reference:
free_guidance.py:470-668 + utils/guidance_functions.py) on the freefine_tpu
stack: differentiable energy functions over the UNet's cross-attention maps
(object shape / size / centroid / silhouette) and an up-block feature tap,
whose latent gradient steers the noise prediction:

    eps' = eps + g_weight * (1 - alpha_cumprod[t]) * dLoss/dLatent
    (free_guidance.py:633-645)

TPU-first design differences:
  * Attention maps are not stored by monkey-patched processors
    (free_guidance.py:384-405): every cross-attention layer sows a
    token-selected map (`EditConfig.sow_token_attn` +
    `EditState.token_select`) into flax intermediates, reduced to the edited
    object's tokens at the source.  `jax.value_and_grad` differentiates
    straight through `Module.apply(..., mutable=["intermediates"])` — no
    grad-enable blocks, no retain_graph.
  * The whole guided denoise is one `lax.scan`; the reference's per-step
    Python schedule `do_self_guidance` (free_guidance.py:335-355) becomes a
    precomputed 0/1 gate array multiplied onto the gradient.
  * The map warp in `silhouette` uses `map_coordinates` (order 1) on raw
    pixel coordinates; torch grid_sample's align_corners=False normalisation
    differs by a half-pixel (documented deviation).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.edit import EditConfig, EditState
from freefine_tpu.schedulers.ddim import DDIMSchedule

# ---------------------------------------------------------------------------
# Energy primitives (jnp ports of utils/guidance_functions.py)
# ---------------------------------------------------------------------------


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(x - min) / (max - min) over the whole array (utils/functions.py:15)."""
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / (hi - lo + 1e-12)


def threshold_attention(attn: jnp.ndarray, s: float = 10.0) -> jnp.ndarray:
    """Soft binarisation of an attention map (guidance_functions.py:17-19)."""
    norm = s * (normalize(attn) - 0.5)
    return normalize(jax.nn.sigmoid(norm))


def get_shape(attn: jnp.ndarray, s: float = 20.0) -> jnp.ndarray:
    return threshold_attention(attn, s)


def get_size(attn: jnp.ndarray) -> jnp.ndarray:
    """Normalised object area (guidance_functions.py:24-25)."""
    return threshold_attention(attn).sum((1, 2)).mean() / attn.shape[-2]


def get_centroid(attn: jnp.ndarray) -> jnp.ndarray:
    """Attention-weighted centroid [x, y] (guidance_functions.py:27-35)."""
    if attn.ndim == 2:
        attn = attn[:, :, None]
    h = w = int(math.isqrt(attn.shape[-2]))
    a = attn.mean(0).reshape(h, w, attn.shape[-1])
    hs = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    ws = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    weighted_w = jnp.sum(ws * a, axis=(0, 1))
    weighted_h = jnp.sum(hs * a, axis=(0, 1))
    return jnp.stack([weighted_w, weighted_h]) / (a.sum((0, 1)) + 1e-12)


def attn_diff_norm(a: jnp.ndarray, hard: bool = False, thresh: float = 0.5,
                   token_valid: Optional[jnp.ndarray] = None):
    """Min/max normalise + soft binarise of [n, h, w, k] token-map stacks,
    REFERENCE-EXACT (guidance_functions.py:188-198): the reference reduces
    dims (2, 3) = (width, token) — each ROW of each map is normalised
    jointly across the object's tokens, not each map over (h, w).  That is
    almost certainly a dims bug upstream (golden-pinned in
    tests/test_reference_golden_baselines.py), but it is what every
    GeoBench SelfGuidance number was produced with, so it is the default
    here.  `token_valid` [k] masks our zero-padded token rows out of the
    min/max and zeroes their output (the reference indexes only the real
    object tokens, so padding must not join the row statistics)."""
    if token_valid is None:
        v = jnp.ones((1, 1, 1, a.shape[-1]), bool)
    else:
        v = token_valid.reshape(1, 1, 1, -1).astype(bool)
    big = jnp.float32(3.0e38)

    def mn(x):
        return jnp.where(v, x, big).min((2, 3), keepdims=True)

    def mx(x):
        return jnp.where(v, x, -big).max((2, 3), keepdims=True)

    lo, hi = mn(a), mx(a)
    t = (a - lo) / (hi - lo + 1e-4)
    if hard:
        return (t > thresh).astype(jnp.float32) * v
    b = jax.nn.sigmoid((t - thresh) * 10.0)
    lo, hi = mn(b), mx(b)
    return jnp.where(v, (b - lo) / (hi - lo + 1e-4), 0.0)


def soft_centroid(a: jnp.ndarray) -> jnp.ndarray:
    """[n, h, w, k] -> [n, k, 2] normalised (x, y) centroids
    (guidance_functions.py:200-217)."""
    n, h, w, k = a.shape
    xs = jnp.linspace(0.0, 1.0, w)
    ys = jnp.linspace(0.0, 1.0, h)
    ax = a.sum(1)  # [n, w, k]
    ay = a.sum(2)  # [n, h, k]

    def f(attn, lin):
        attn = attn / (attn.sum(-2, keepdims=True) + 1e-4)
        return (lin[None, :, None] * attn).sum(-2)

    return jnp.stack([f(ax, xs), f(ay, ys)], -1)


def fix_appearances_by_feature(ori_feats, edit_feats) -> jnp.ndarray:
    """Feature-tap MSE appearance term (guidance_functions.py:372-375)."""
    return jnp.mean((ori_feats.astype(jnp.float32)
                     - edit_feats.astype(jnp.float32)) ** 2)


def fix_shapes_l1(orig_maps, edit_maps, tau: float = 1.0) -> jnp.ndarray:
    """Mean soft-shape delta over map lists (guidance_functions.py:67-81);
    maps are [n, S, T] token-selected stacks."""
    deltas = [
        (tau * get_shape(o) - get_shape(e)).mean()
        for o, e in zip(orig_maps, edit_maps)
    ]
    return jnp.stack(deltas).mean()


def fix_sizes(orig_maps, edit_maps, tau: float = 1.0) -> jnp.ndarray:
    """Relative-size energy (guidance_functions.py:122-131)."""
    sizes = [
        tau * get_size(o) - get_size(e)
        for o, e in zip(orig_maps, edit_maps)
    ]
    return jnp.stack(sizes).mean()


def position_deltas(orig_maps, edit_maps,
                    target_centroid: Optional[jnp.ndarray] = None):
    """Centroid-move energy (guidance_functions.py:133-143)."""
    out = []
    for o, e in zip(orig_maps, edit_maps):
        tgt = get_centroid(o) if target_centroid is None else target_centroid
        out.append((tgt - get_centroid(e)).mean())
    return jnp.stack(out).mean()


def _warp_maps(maps: jnp.ndarray, ref_maps: jnp.ndarray,
               rot: float, sy: float, sx: float, dy: float, dx: float):
    """Sample `maps` [n, h, w, k] at coordinates rotated/scaled/shifted about
    the reference maps' centroids (silhouette transform,
    guidance_functions.py:257-300)."""
    n, h, w, k = maps.shape
    c = soft_centroid(ref_maps)[:, 0, :]          # [n, 2] (x, y), k=0 slice
    ch = c[:, 1, None, None] * h
    cw = c[:, 0, None, None] * w

    hh, ww = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    hh = hh[None] - ch
    ww = ww[None] - cw
    # jnp trig so rot/sy/sx/dy/dx may be traced values — the guided loop
    # compiles ONCE for every GeoBench edit_param instead of per case
    th = rot * (math.pi / 180.0)
    w_r = jnp.cos(th) * ww + jnp.sin(th) * hh
    h_r = -jnp.sin(th) * ww + jnp.cos(th) * hh
    h_r = h_r / sy - dy * h * sy + ch
    w_r = w_r / sx - dx * w * sx + cw

    # grid_sample parity: the reference normalises coordinates with the
    # align_corners=True formula (2x/(W-1) - 1) but samples with
    # align_corners=False (guidance_functions.py:289-299), so its
    # effective sample position is x*W/(W-1) - 0.5.  Replicated exactly
    # (golden-pinned in tests/test_reference_golden_baselines.py);
    # zeros padding == map_coordinates mode="constant".
    h_r = h_r * (h / (h - 1)) - 0.5
    w_r = w_r * (w / (w - 1)) - 0.5

    def sample_one(m, yy, xx):          # m [h, w, k]
        def per_token(mk):
            return jax.scipy.ndimage.map_coordinates(
                mk, [yy, xx], order=1, mode="constant", cval=0.0
            )
        return jax.vmap(per_token, in_axes=-1, out_axes=-1)(m)

    return jax.vmap(sample_one)(maps, h_r, w_r)


def silhouette_loss(
    edit_up_maps: Sequence[jnp.ndarray],
    ref_up_maps: Sequence[jnp.ndarray],
    ori_feats: jnp.ndarray,
    edit_feats: jnp.ndarray,
    appearance_weight: float,
    rot: float = 0.0, sy: float = 1.0, sx: float = 1.0,
    dy: float = 0.0, dx: float = 0.0,
    l2: bool = False,
    token_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GeoBench silhouette guidance (guidance_functions.py:219-311): warp the
    edit stream's up-block object maps by the requested geometric transform
    (about the reference maps' centroid) and pull them toward the reference
    maps, plus the feature-appearance term.  Reference-exact, incl. its
    row-wise normalisation and grid_sample coordinate conventions
    (golden-pinned in tests/test_reference_golden_baselines.py);
    `token_valid` [k] masks zero-padded token rows so only the real object
    tokens enter the statistics and the mean, like the reference's
    obj_idx indexing."""
    loss = jnp.float32(0.0)
    for e_map, r_map in zip(edit_up_maps, ref_up_maps):
        n, s, k = e_map.shape
        h = w = int(math.isqrt(s))
        tgt = attn_diff_norm(e_map.reshape(n, h, w, k),
                             token_valid=token_valid)
        ref = attn_diff_norm(r_map.reshape(n, h, w, k),
                             token_valid=token_valid)
        warped = _warp_maps(tgt, ref, rot, sy, sx, dy, dx)
        diff = 0.5 * (ref - warped) ** 2 if l2 else jnp.abs(ref - warped)
        if token_valid is None:
            geo = diff.mean()
        else:
            v = token_valid.reshape(1, 1, 1, -1).astype(jnp.float32)
            geo = (diff * v).sum() / jnp.maximum(
                n * h * w * token_valid.sum(), 1.0
            )
        loss = loss + geo + appearance_weight * fix_appearances_by_feature(
            ori_feats, edit_feats
        )
    return loss


# ---------------------------------------------------------------------------
# Guidance-step schedule
# ---------------------------------------------------------------------------


def _ref_transform_gate(rot, sy, sx, dy, dx) -> bool:
    """The reference's has-transform check (guidance_functions.py:257):
    ``rot != 0 or any(_ != 1. for _ in [sy, sx, dy, dx])``.  Note dy/dx are
    compared against 1 — identity is dy=dx=0 — so this is True for every
    GeoBench edit (including pure-identity params): the silhouette loss
    effectively always runs.  Replicated exactly."""
    return rot != 0 or any(v != 1.0 for v in (sy, sx, dy, dx))


def guidance_gates(num_steps: int, scheduler: str = "ddpm") -> np.ndarray:
    """0/1 per-step gates replacing `do_self_guidance`
    (free_guidance.py:335-355) for the DDPM / DDIM branches."""
    t = num_steps
    i = np.arange(t)
    if scheduler == "ddpm":
        early = i <= (5 * t) // 16
    else:
        early = i <= (3 * t) // 16
    late = i >= t - t // 32
    alt = (i % 2) == 0
    return np.where(late, 0, np.where(early, 1, alt)).astype(np.float32)


# ---------------------------------------------------------------------------
# Schedulers: DDPM ancestral step + CFG DDIM inversion
# ---------------------------------------------------------------------------


def ddpm_step(schedule: DDIMSchedule, eps, t, x, rng):
    """DDPM ancestral step over the subsampled grid (diffusers DDPMScheduler
    semantics with clip_sample=False, as configured by the baseline)."""
    x32 = x.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    a_t = schedule.alpha_at(t)
    a_p = schedule.alpha_at(t - schedule.step_delta)
    alpha_cur = a_t / a_p
    beta_cur = 1.0 - alpha_cur

    x0 = (x32 - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    coef_x0 = jnp.sqrt(a_p) * beta_cur / (1.0 - a_t)
    coef_xt = jnp.sqrt(alpha_cur) * (1.0 - a_p) / (1.0 - a_t)
    mean = coef_x0 * x0 + coef_xt * x32

    var = jnp.clip((1.0 - a_p) / (1.0 - a_t) * beta_cur, 1e-20)
    noise = jax.random.normal(rng, x.shape, jnp.float32)
    has_noise = (t - schedule.step_delta >= 0).astype(jnp.float32)
    return (mean + has_noise * jnp.sqrt(var) * noise).astype(x.dtype)


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------


class SelfGuidance:
    """Self-guided editing over a FreeFine pipeline's SD backbone.

    GeoBench protocol (eval_geobench.py:131-146): CFG-1.5 DDIM inversion of
    the source image (saving the final step's object attention maps as the
    silhouette reference), then a DDPM denoise from the inverted latent with
    per-step silhouette guidance parameterised by the 9-param edit transform.
    """

    def __init__(self, pipe, max_obj_tokens: int = 8):
        self.pipe = pipe
        self.max_obj_tokens = max_obj_tokens
        self._cache = {}

    # -- token selection -------------------------------------------------------

    def token_select(self, prompt: str, obj: str) -> np.ndarray:
        """One-hot [T_sel, 77] rows for the object's token positions in the
        prompt (free_guidance.py:358-368); zero rows pad to T_sel."""
        tok = self.pipe.tokenizer
        prompt_ids = np.asarray(tok.batch_encode([prompt])[0])
        obj_ids = [
            i for i in np.asarray(tok.batch_encode([obj])[0])
            if i not in (tok.bos, tok.eos)
        ]
        sel = np.zeros((self.max_obj_tokens, len(prompt_ids)), np.float32)
        r = 0
        for o in obj_ids:
            for pos in np.where(prompt_ids == o)[0]:
                if r < self.max_obj_tokens:
                    sel[r, pos] = 1.0
                    r += 1
        return sel

    # -- jitted stages ---------------------------------------------------------

    def _sow_cfg(self) -> EditConfig:
        return EditConfig(mode="none", method=None, local_cfg=False,
                          sow_token_attn=True, num_streams=2)

    def _apply_sow(self, params, lat2, t, ctx2, select):
        """One CFG UNet pass with map/feature sowing.  Returns
        (eps2, up_maps[cond half], feats[cond half])."""
        pipe = self.pipe
        state = EditState(token_select=select)
        eps2, inter = pipe.unet.apply(
            params["unet"], lat2, t, ctx2,
            edit_cfg=self._sow_cfg(), edit_state=state,
            mutable=["intermediates"],
        )
        flat = _flatten_sow(inter["intermediates"])
        up_maps = [
            _cond_half(v) for k, v in flat if "token_attn_up" in k
        ]
        feats = [v for k, v in flat if "guidance_feature" in k]
        feat = feats[0][1:] if feats else jnp.zeros((1,), jnp.float32)
        return eps2, up_maps, feat

    def _invert(self, steps: int, batched: bool = False):
        key = ("invert", steps, batched)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=steps)

        def run(params, latent, ctx2, guidance_scale):
            from freefine_tpu.schedulers.ddim import inv_step

            def body(x, t):
                pair = jnp.concatenate([x, x], axis=0)
                eps2 = pipe.unet.apply(params["unet"], pair, t, ctx2)
                u, c = eps2[:1], eps2[1:]
                eps = u + guidance_scale * (c - u)
                x_next, _ = inv_step(schedule, eps, t, x)
                return x_next, None

            out, _ = jax.lax.scan(body, latent, schedule.timesteps[::-1])
            return out

        fn = (
            jax.vmap(run, in_axes=(None, 0, 0, None)) if batched else run
        )
        self._cache[key] = (schedule, jax.jit(fn))
        return self._cache[key]

    def _guided_loop(self, steps: int, guidance_scale: float,
                     g_weight: float, guided: bool, appearance_weight,
                     batched: bool = False):
        """`run` takes the silhouette transform as a TRACED [5] array
        (rot, sy, sx, dy, dx), so one compiled program serves every
        GeoBench edit_param (the transform used to be a static cache key —
        a full value_and_grad UNet recompile per case).  `guided=False`
        compiles the transform-free variant (zero loss, no grad);
        `batched=True` vmaps over a leading case axis (edit_batch)."""
        key = ("loop", steps, guidance_scale, g_weight, guided,
               appearance_weight, batched)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=steps)
        has_transform = guided

        def run(params, latent, ctx2, select, ref_maps, gates, transform,
                rng):
            rot, sy, sx, dy, dx = (
                transform[0], transform[1], transform[2], transform[3],
                transform[4],
            )
            def eps_cfg(eps2):
                u, c = eps2[:1], eps2[1:]
                return u + guidance_scale * (c - u)

            def step(carry, inp):
                edit_lat, ori_lat, rng = carry
                t, gate = inp
                rng, r_ori, r_edit = jax.random.split(rng, 3)

                # unguided original stream (free_guidance.py:613-617)
                ori2 = jnp.concatenate([ori_lat, ori_lat], axis=0)
                eps_o2, _, ori_feats = self._apply_sow(
                    params, ori2, t, ctx2, select
                )
                ori_next = ddpm_step(
                    schedule, eps_cfg(eps_o2), t, ori_lat, r_ori
                )

                # guided edit stream: loss gradient w.r.t. the latent
                def loss_fn(lat):
                    pair = jnp.concatenate([lat, lat], axis=0)
                    eps2, up_maps, feats = self._apply_sow(
                        params, pair, t, ctx2, select
                    )
                    if has_transform:
                        loss = silhouette_loss(
                            up_maps, ref_maps, ori_feats, feats,
                            appearance_weight, rot, sy, sx, dy, dx,
                            token_valid=select.sum(-1) > 0,
                        )
                    else:
                        loss = jnp.float32(0.0)
                    return loss, eps_cfg(eps2)

                (loss, eps_e), grad = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(edit_lat)
                sig_t = 1.0 - schedule.alpha_at(t)
                eps_e = eps_e + g_weight * sig_t * gate * grad
                edit_next = ddpm_step(schedule, eps_e, t, edit_lat, r_edit)
                return (edit_next, ori_next, rng), loss

            (edit_lat, ori_lat, _), losses = jax.lax.scan(
                step, (latent, latent, rng),
                (schedule.timesteps, gates),
            )
            return edit_lat, ori_lat, losses

        fn = (
            jax.vmap(run, in_axes=(None, 0, 0, 0, 0, None, 0, 0))
            if batched else run
        )
        self._cache[key] = (schedule, jax.jit(fn))
        return self._cache[key]

    # -- public API --------------------------------------------------------------

    def edit(
        self,
        ori_image: np.ndarray,
        prompt: str,
        obj: str,
        edit_param: Sequence[float],
        steps: int = 50,
        guidance_scale: float = 7.5,
        inversion_guidance: float = 1.5,
        g_weight: float = 15.0,
        appearance_weight: float = 0.8,
        seed: int = 42,
    ) -> np.ndarray:
        """GeoBench silhouette edit (eval_geobench.py:131-146): edit_param is
        the 9-param [dx, dy, dz, rx, ry, rz, sx, sy, sz] vector; dx/dy are
        fractional shifts, rz degrees, sx/sy scales — exactly the subset the
        reference baseline consumes (rot=rz, sy, sx, dy, dx)."""
        pipe = self.pipe
        select = jnp.asarray(self.token_select(prompt, obj))
        latent = pipe.image_to_latent(ori_image)
        ctx_c = pipe.encode_text([prompt])
        ctx_u = pipe.encode_text([" "])
        ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0)

        schedule, invert = self._invert(steps)
        inv_latent = invert(pipe.params, latent, ctx2,
                            jnp.float32(inversion_guidance))

        # silhouette reference: object maps at the deepest noise level
        # (the maps the reference keeps from its final inversion forward,
        # free_guidance.py:625-626)
        pair = jnp.concatenate([inv_latent, inv_latent], axis=0)
        _, ref_maps, _ = jax.jit(self._apply_sow)(
            pipe.params, pair, schedule.timesteps[0], ctx2, select
        )
        ref_maps = [attn_stop(m) for m in ref_maps]

        dx, dy = float(edit_param[0]), float(edit_param[1])
        rz = float(edit_param[5])
        sx, sy = float(edit_param[6]), float(edit_param[7])
        transform = (rz, sy if sy else 1.0, sx if sx else 1.0, dy, dx)
        # the reference's gate compares dy/dx against 1 (a bug — identity
        # is dy=dx=0), so silhouette guidance is effectively ALWAYS on
        # (guidance_functions.py:257: any(_!=1. for [sy,sx,dy,dx]))
        guided = _ref_transform_gate(*transform)

        _, loop = self._guided_loop(
            steps, float(guidance_scale), float(g_weight), guided,
            float(appearance_weight),
        )
        gates = jnp.asarray(guidance_gates(steps, "ddpm"))
        edit_lat, _, _ = loop(
            pipe.params, inv_latent, ctx2, select, ref_maps, gates,
            jnp.asarray(transform, jnp.float32), jax.random.key(seed),
        )
        return pipe.latent_to_image(edit_lat)[0]

    def edit_batch(
        self,
        images: Sequence[np.ndarray],
        prompts: Sequence[str],
        objs: Sequence[str],
        edit_params: Sequence[Sequence[float]],
        steps: int = 50,
        guidance_scale: float = 7.5,
        inversion_guidance: float = 1.5,
        g_weight: float = 15.0,
        appearance_weight: float = 0.8,
        seed=42,
    ) -> List[np.ndarray]:
        """Case-batched `edit`: the inversion scan, the reference-map
        capture and the guided grad scan each run ONCE over a leading case
        axis (jit(vmap)), with each case's silhouette transform as traced
        values — the GeoBench batching the reference's per-case loop
        (SelfGuidance/eval_geobench.py) never had.

        One compiled program serves the whole batch, so `guided` is the OR
        over cases: a batch mixing real transforms with identity ones runs
        the guided scan for all of them (an identity case then still takes
        tiny silhouette-gradient steps, where per-case `edit` would pick
        the transform-free program).  GeoBench has no identity edits, so
        the eval lane never hits this."""
        pipe = self.pipe
        b = len(images)
        assert len(prompts) == len(objs) == len(edit_params) == b
        seeds = seed if isinstance(seed, (list, tuple)) else [seed] * b

        select = jnp.stack(
            [jnp.asarray(self.token_select(p, o))
             for p, o in zip(prompts, objs)]
        )
        latent = jnp.stack(
            [pipe.image_to_latent(img) for img in images]
        )                                                  # [B, 1, ...]
        ctx_u = pipe.encode_text([" "])
        ctx2 = jnp.stack(
            [jnp.concatenate([ctx_u, pipe.encode_text([p])], axis=0)
             for p in prompts]
        )                                                  # [B, 2, 77, d]

        schedule, invert = self._invert(steps, batched=True)
        inv_latent = invert(pipe.params, latent, ctx2,
                            jnp.float32(inversion_guidance))

        sow_key = ("sow_batch",)
        if sow_key not in self._cache:
            self._cache[sow_key] = jax.jit(jax.vmap(
                self._apply_sow, in_axes=(None, 0, None, 0, 0)
            ))
        pair = jnp.concatenate([inv_latent, inv_latent], axis=1)
        _, ref_maps, _ = self._cache[sow_key](
            pipe.params, pair, schedule.timesteps[0], ctx2, select
        )
        ref_maps = [attn_stop(m) for m in ref_maps]

        transforms, guided = [], False
        for ep in edit_params:
            dx, dy = float(ep[0]), float(ep[1])
            rz = float(ep[5])
            sx, sy = float(ep[6]), float(ep[7])
            transforms.append(
                (rz, sy if sy else 1.0, sx if sx else 1.0, dy, dx)
            )
            guided = guided or _ref_transform_gate(*transforms[-1])

        _, loop = self._guided_loop(
            steps, float(guidance_scale), float(g_weight), guided,
            float(appearance_weight), batched=True,
        )
        gates = jnp.asarray(guidance_gates(steps, "ddpm"))
        rngs = jnp.stack([jax.random.key(s) for s in seeds])
        edit_lat, _, _ = loop(
            pipe.params, inv_latent, ctx2, select, ref_maps, gates,
            jnp.asarray(transforms, jnp.float32), rngs,
        )
        return [
            pipe.latent_to_image(edit_lat[j])[0] for j in range(b)
        ]


def attn_stop(x):
    return jax.lax.stop_gradient(x)


def _flatten_sow(tree, prefix="") -> List[Tuple[str, jnp.ndarray]]:
    """Flatten a flax intermediates tree to (path, value) leaves, unwrapping
    the per-call tuples sow produces."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten_sow(v, prefix + "/" + k))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.extend(_flatten_sow(v, prefix if len(tree) == 1
                                    else f"{prefix}#{i}"))
    else:
        out.append((prefix, tree))
    return out


def _cond_half(m: jnp.ndarray) -> jnp.ndarray:
    """[2H, S, T] stacked CFG maps -> conditional half [H, S, T]
    (the reference's .chunk(2)[1], guidance_functions.py:73-77)."""
    return m[m.shape[0] // 2:]
