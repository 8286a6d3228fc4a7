"""DragDiffusion baseline core, TPU-native — including LoRA training.

Reimplements the editing method of evaluation/DragDiffusion (the only
*training* code the reference exercises) on the freefine_tpu stack:

  1. Per-image DreamBooth-LoRA fine-tuning of the UNet's attention
     projections (reference utils/lora_utils.py:108-340: rank 16, lr 5e-4,
     80 steps, epsilon-MSE objective) — here optax Adam over functional
     low-rank deltas merged into the parameter tree per step.
  2. DDIM inversion of the source image to t = inversion_strength * T
     (geobench_eval.py:156-169).
  3. Motion-supervised latent optimization with point tracking
     (utils/drag_utils.py:25-185): n_pix_step Adam iterations on the latent,
     each pulling the feature patch around every handle point one unit
     toward its target, with an L1 background anchor, then re-locating the
     handles by nearest-neighbour feature matching.
  4. Final denoise with MasaCtrl mutual self-attention — the un-dragged
     branch rides along as batch stream 0 and shares its self-attn K/V
     (utils/attn_utils.py:44-98), expressed as `EditConfig(mode="drag",
     kv_source_stream=0)`.

TPU-first design differences:
  * LoRA is a pytree of (A, B) factors; `merge_lora` adds A @ B into the
    dense kernels functionally — no module surgery, and the merged forward
    is the plain jitted UNet.
  * The 80-iteration drag loop is one `lax.scan`; the reference's Python
    `break` on handle arrival becomes a 0/1 gate that freezes the state.
  * Point patches use `map_coordinates` (order 1) with a fixed (2r+1)^2
    stencil — the reference's shape-mismatch trimming (drag_utils.py:156-165)
    never arises.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from freefine_tpu.edit import EditConfig, EditState
from freefine_tpu.schedulers.ddim import DDIMSchedule, inv_step

LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out_0")


# ---------------------------------------------------------------------------
# Functional LoRA
# ---------------------------------------------------------------------------


def lora_paths(unet_params: dict) -> List[Tuple[str, ...]]:
    """Paths of every attention-projection kernel to adapt (the reference
    attaches LoRAAttnProcessor to all to_q/k/v/out, lora_utils.py:171-204)."""
    flat = traverse_util.flatten_dict(unet_params["params"])
    return sorted(
        p for p in flat
        if p[-1] == "kernel" and len(p) >= 2 and p[-2] in LORA_TARGETS
    )


def init_lora(unet_params: dict, rank: int, rng) -> Dict:
    """{joined_path: {'a': [in, r], 'b': [r, out]}} — A gaussian / B zero, so
    the adapted model starts exactly at the base weights."""
    flat = traverse_util.flatten_dict(unet_params["params"])
    out = {}
    for p in lora_paths(unet_params):
        w = flat[p]
        rng, r = jax.random.split(rng)
        a = jax.random.normal(r, (w.shape[0], rank), jnp.float32) / rank
        b = jnp.zeros((rank, w.shape[1]), jnp.float32)
        out["/".join(p)] = {"a": a, "b": b}
    return out


def merge_lora(unet_params: dict, lora: Dict, scale: float = 1.0) -> dict:
    """Base params with W <- W + scale * A @ B at every adapted kernel."""
    flat = dict(traverse_util.flatten_dict(unet_params["params"]))
    for key, ab in lora.items():
        p = tuple(key.split("/"))
        delta = (ab["a"] @ ab["b"]) * scale
        flat[p] = flat[p] + delta.astype(flat[p].dtype)
    return {
        **unet_params,
        "params": traverse_util.unflatten_dict(flat),
    }


def train_lora(
    pipe,
    image: np.ndarray,
    prompt: str,
    rank: int = 16,
    steps: int = 80,
    lr: float = 5e-4,
    seed: int = 0,
) -> Dict:
    """Per-image DreamBooth-LoRA fine-tune (lora_utils.py:108-340): sample a
    random train timestep, noise the image latent, regress the UNet's eps on
    the injected noise; only the LoRA factors receive gradients."""
    schedule = DDIMSchedule.create(num_inference_steps=50)
    latent = pipe.image_to_latent(image)
    ctx = pipe.encode_text([prompt])
    unet_params = pipe.params["unet"]

    lora = init_lora(unet_params, rank, jax.random.key(seed))
    tx = optax.adam(lr)
    opt_state = tx.init(lora)

    def loss_fn(lora, noisy, t, noise):
        merged = merge_lora(unet_params, lora)
        pred = pipe.unet.apply(merged, noisy, t, ctx)
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

    @jax.jit
    def train_step(lora, opt_state, rng):
        r_t, r_n = jax.random.split(rng)
        t = jax.random.randint(r_t, (), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(r_n, latent.shape, jnp.float32)
        a_t = schedule.alphas_cumprod[t]
        noisy = (
            jnp.sqrt(a_t) * latent.astype(jnp.float32)
            + jnp.sqrt(1.0 - a_t) * noise
        )
        loss, grads = jax.value_and_grad(loss_fn)(lora, noisy, t, noise)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(lora, updates), opt_state, loss

    rng = jax.random.key(seed + 1)
    for _ in range(steps):
        rng, r = jax.random.split(rng)
        lora, opt_state, _ = train_step(lora, opt_state, r)
    return lora


# ---------------------------------------------------------------------------
# Point utilities (sup-res feature grid)
# ---------------------------------------------------------------------------


def _patch_coords(center_y, center_x, radius: int):
    """(2r+1)^2 integer stencil around a (possibly fractional) center."""
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    yy = center_y + offs[:, None] + jnp.zeros((1, 2 * radius + 1))
    xx = center_x + offs[None, :] + jnp.zeros((2 * radius + 1, 1))
    return yy, xx


def sample_patch(feat: jnp.ndarray, yy, xx) -> jnp.ndarray:
    """Bilinear patch of feat [H, W, C] at fractional coords
    (drag_utils.interpolate_feature_patch, :55-84)."""
    def per_channel(fc):
        return jax.scipy.ndimage.map_coordinates(
            fc, [yy, xx], order=1, mode="nearest"
        )
    return jax.vmap(per_channel, in_axes=-1, out_axes=-1)(feat)


def track_point(f0_vec, feat, point, r_p: int):
    """Nearest-neighbour re-location of one handle point within a
    (2 r_p + 1)^2 window (drag_utils.point_tracking, :25-46).

    The reference truncates the window at the image border
    ([max(0, p-r), min(H, p+r+1))); our dynamic_slice window is
    shape-static (shifted inward when clamped), so cells outside the
    reference's range are masked to +inf — exact parity incl. borders
    (tests/test_reference_golden_baselines.py)."""
    h, w, _ = feat.shape
    size = 2 * r_p + 1
    py = jnp.floor(point[0]).astype(jnp.int32)
    px = jnp.floor(point[1]).astype(jnp.int32)
    y0 = jnp.clip(py - r_p, 0, h - size)
    x0 = jnp.clip(px - r_p, 0, w - size)
    window = jax.lax.dynamic_slice(
        feat, (y0, x0, 0), (size, size, feat.shape[-1])
    )
    dist = jnp.abs(window.astype(jnp.float32) - f0_vec).sum(-1)
    yy = y0 + jnp.arange(size)[:, None]
    xx = x0 + jnp.arange(size)[None, :]
    valid = (
        (yy >= jnp.maximum(0, py - r_p)) & (yy < py + r_p + 1)
        & (xx >= jnp.maximum(0, px - r_p)) & (xx < px + r_p + 1)
    )
    dist = jnp.where(valid, dist, jnp.float32(jnp.inf))
    flat = jnp.argmin(dist)
    row, col = flat // size, flat % size
    return jnp.stack([(y0 + row).astype(jnp.float32),
                      (x0 + col).astype(jnp.float32)])


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------


class DragDiffusion:
    """DragDiffusion editing over a FreeFine pipeline's SD backbone.

    GeoBench defaults (geobench_eval.py:65-105,261-264): 50-step DDIM,
    inversion_strength 0.7, latent lr 0.01, 80 drag iterations, r_m 1,
    r_p 3, lam 0.1, feature = last up block resized to half image res,
    LoRA rank 16 / 80 steps / lr 5e-4, cfg 1.0.
    """

    def __init__(self, pipe):
        self.pipe = pipe
        self._cache = {}

    def _feature_index(self) -> int:
        # features list from the UNet is [mid, up_0 .. up_{n-1}]; the
        # reference taps up_blocks[3] (unet_feature_idx=3)
        return len(self.pipe.config.unet.block_out_channels)

    def _masactrl_cfg(self) -> EditConfig:
        return EditConfig(
            mode="drag", method=None, local_cfg=False, num_streams=2,
            kv_source_stream=0, layer_range=(10, 16),
            tca_scope=("down", "mid", "up"),
        )

    # -- jitted stages -------------------------------------------------------

    def _drag_loop(self, t_step: int, n_pix_step: int, r_m: int, r_p: int,
                   lam: float, lr: float, sup_hw: Tuple[int, int]):
        key = ("drag", t_step, n_pix_step, r_m, r_p, lam, lr, sup_hw)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=50)
        sup_h, sup_w = sup_hw

        def features(merged, code, ctx):
            eps, feats = pipe.unet.apply(
                merged, code, jnp.int32(t_step), ctx, return_features=True
            )
            f = feats[self._feature_index()]
            f = jax.image.resize(
                f.astype(jnp.float32),
                (f.shape[0], sup_h, sup_w, f.shape[-1]), "bilinear",
            )
            return eps, f[0]

        def ddim_prev(eps, code):
            t = jnp.int32(t_step)
            a_t = schedule.alpha_at(t)
            a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
            x0 = (code.astype(jnp.float32)
                  - jnp.sqrt(1.0 - a_t) * eps.astype(jnp.float32)
                  ) / jnp.sqrt(a_t)
            return jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps.astype(
                jnp.float32
            )

        def run(merged, init_code, ctx, handles0, targets, valid, mask_sup):
            # reference state at the drag timestep (drag_utils.py:102-107)
            eps0, f0 = features(merged, init_code, ctx)
            x_prev_0 = ddim_prev(eps0, init_code)
            f0_vecs = jax.vmap(
                lambda p: f0[
                    jnp.clip(p[0].astype(jnp.int32), 0, sup_h - 1),
                    jnp.clip(p[1].astype(jnp.int32), 0, sup_w - 1),
                ]
            )(handles0)

            mask_lat = jax.image.resize(
                mask_sup, (init_code.shape[1], init_code.shape[2]), "nearest"
            )[None, :, :, None]
            use_mask = jnp.sum(mask_sup) > 0

            tx = optax.adam(lr)

            def loss_fn(code, handles, step_i):
                eps, f1 = features(merged, code, ctx)
                x_prev = ddim_prev(eps, code)
                f1s = jax.lax.stop_gradient(f1)

                # point tracking on the current features BEFORE the motion
                # loss, skipped at iteration 0 (drag_utils.py:128-129)
                tracked = jax.vmap(
                    lambda fv, p, ok: jnp.where(
                        (ok > 0) & (step_i > 0), track_point(fv, f1s, p, r_p), p
                    )
                )(f0_vecs, handles, valid)

                def point_loss(p, t, ok):
                    d = t - p
                    dist = jnp.linalg.norm(d)
                    di = d / jnp.maximum(dist, 1e-8)
                    yy, xx = _patch_coords(p[0], p[1], r_m)
                    f_now = jax.lax.stop_gradient(
                        sample_patch(f1, jnp.round(yy), jnp.round(xx))
                    )
                    f_moved = sample_patch(f1, yy + di[0], xx + di[1])
                    l1 = jnp.abs(f_now - f_moved).mean()
                    gate = ok * (dist >= 2.0)
                    return gate * (2 * r_m + 1) ** 2 * l1

                pl = jax.vmap(point_loss)(tracked, targets, valid)
                loss = pl.sum()
                anchor = jnp.abs(
                    (x_prev - x_prev_0) * (1.0 - mask_lat)
                ).sum()
                loss = loss + jnp.where(use_mask, lam * anchor, 0.0)
                return loss, tracked

            def body(carry, step_i):
                code, handles, opt_state, done = carry
                (loss, tracked), grad = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(code, handles, step_i)

                dists = jnp.linalg.norm(tracked - targets, axis=-1)
                reached = jnp.all(jnp.where(valid > 0, dists < 2.0, True))
                done_now = done | reached  # break BEFORE this iter's update

                updates, new_opt = tx.update(grad, opt_state)
                new_code = optax.apply_updates(code, updates)

                code = jnp.where(done_now, code, new_code)
                handles = jnp.where(done, handles, tracked)
                opt_state = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(done_now, a, b), opt_state, new_opt
                )
                return (code, handles, opt_state, done_now), loss

            opt_state = tx.init(init_code)
            (code, handles, _, _), losses = jax.lax.scan(
                body, (init_code, handles0, opt_state, jnp.bool_(False)),
                jnp.arange(n_pix_step),
            )
            return code, handles, losses

        self._cache[key] = jax.jit(run)
        return self._cache[key]

    def _invert(self, num_actual: int):
        key = ("invert", num_actual)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=50)
        ts = jnp.flip(schedule.timesteps)[:num_actual]

        def run(merged, latent, ctx):
            def body(x, t):
                eps = pipe.unet.apply(merged, x, t, ctx)
                x, _ = inv_step(schedule, eps, t, x)
                return x, None
            out, _ = jax.lax.scan(body, latent, ts)
            return out

        self._cache[key] = jax.jit(run)
        return self._cache[key]

    def _denoise_masactrl(self, num_actual: int):
        key = ("denoise", num_actual)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=50)
        ts = schedule.timesteps[50 - num_actual:]
        ecfg = self._masactrl_cfg()

        def run(merged, pair, ctx2, gates):
            def body(x, inp):
                t, g = inp
                state = EditState(share_gate=g)
                eps = pipe.unet.apply(
                    merged, x, t, ctx2, edit_cfg=ecfg, edit_state=state
                )
                a_t = schedule.alpha_at(t)
                a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
                x32 = x.astype(jnp.float32)
                e32 = eps.astype(jnp.float32)
                x0 = (x32 - jnp.sqrt(1.0 - a_t) * e32) / jnp.sqrt(a_t)
                x = (jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * e32).astype(
                    x.dtype
                )
                return x, None
            out, _ = jax.lax.scan(body, pair, (ts, gates))
            return out

        self._cache[key] = jax.jit(run)
        return self._cache[key]

    # -- public API -----------------------------------------------------------

    def drag(
        self,
        ori_image: np.ndarray,
        handle_points: np.ndarray,     # [N, 2] image-space (x, y)
        target_points: np.ndarray,     # [N, 2] image-space (x, y)
        prompt: str,
        mask: Optional[np.ndarray] = None,
        inversion_strength: float = 0.7,
        latent_lr: float = 0.01,
        n_pix_step: int = 80,
        lam: float = 0.1,
        r_m: int = 1,
        r_p: int = 3,
        lora: Optional[Dict] = None,
        train_lora_steps: int = 0,
        lora_rank: int = 16,
        lora_lr: float = 5e-4,
        masactrl_start_step: int = 4,
        max_points: int = 16,
        seed: int = 42,
    ) -> np.ndarray:
        """Drag-edit `ori_image` (geobench_eval.py:45-206 protocol)."""
        pipe = self.pipe
        full_h, full_w = ori_image.shape[:2]
        sup_h, sup_w = int(0.5 * full_h), int(0.5 * full_w)
        n_actual = round(inversion_strength * 50)
        t_step = int(
            np.asarray(
                DDIMSchedule.create(num_inference_steps=50).timesteps
            )[50 - n_actual]
        )

        if train_lora_steps and lora is None:
            lora = train_lora(pipe, ori_image, prompt, rank=lora_rank,
                              steps=train_lora_steps, lr=lora_lr, seed=seed)
        merged = (
            merge_lora(pipe.params["unet"], lora)
            if lora else pipe.params["unet"]
        )

        # points at sup res, (y, x) rows (geobench_eval.py:127-145)
        def to_sup(pts):
            pts = np.asarray(pts, np.float64)
            return np.stack(
                [pts[:, 1] / full_h * sup_h, pts[:, 0] / full_w * sup_w], -1
            )

        handles = to_sup(handle_points)
        targets = to_sup(target_points)
        n = len(handles)
        valid = np.zeros((max_points,), np.float32)
        valid[:n] = 1.0
        h_pad = np.zeros((max_points, 2), np.float32)
        t_pad = np.zeros((max_points, 2), np.float32)
        h_pad[:n], t_pad[:n] = handles[:max_points], targets[:max_points]

        mask_sup = (
            np.asarray(
                jax.image.resize(
                    jnp.asarray(mask, jnp.float32), (sup_h, sup_w), "nearest"
                )
            )
            if mask is not None else np.ones((sup_h, sup_w), np.float32)
        )

        latent = pipe.image_to_latent(ori_image)
        ctx = pipe.encode_text([prompt])

        invert = self._invert(n_actual)
        invert_code = invert(merged, latent, ctx)

        drag_loop = self._drag_loop(
            t_step, n_pix_step, r_m, r_p, lam, latent_lr, (sup_h, sup_w)
        )
        updated_code, _, _ = drag_loop(
            merged, invert_code, ctx, jnp.asarray(h_pad, jnp.float32),
            jnp.asarray(t_pad, jnp.float32), jnp.asarray(valid),
            jnp.asarray(mask_sup),
        )

        # final denoise: [source, dragged] under mutual self-attention
        denoise = self._denoise_masactrl(n_actual)
        gates = (np.arange(n_actual) >= masactrl_start_step).astype(np.float32)
        pair = jnp.concatenate([invert_code, updated_code], axis=0)
        ctx2 = jnp.concatenate([ctx, ctx], axis=0)
        out = denoise(merged, pair, ctx2, jnp.asarray(gates))
        return pipe.latent_to_image(out[1:])[0]
