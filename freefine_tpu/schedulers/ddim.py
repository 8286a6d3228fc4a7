"""DDIM schedule math as pure, jittable functions.

Re-derives the reference's scheduler semantics from first principles:

  - inversion step   : reference `FreeFinePipeline.inv_step`
                       (/root/reference/src/demo/model.py:109-132)
  - hybrid ctrl step : reference `ctrl_step` — DDIM everywhere, DDPM
                       (eta-noise) only inside a spatial mask; reference
                       streams kept pure-DDIM (model.py:134-198)
  - variance         : reference `_get_variance` (model.py:200-209)
  - TCA schedule     : reference `linear_param` (model.py:438-455)

Design notes (TPU-first):
  * All per-timestep scalars (alpha_prod, prev-alpha, variance) are gathered
    from precomputed arrays by traced integer timesteps, so the whole denoise
    loop compiles into one `lax.scan` without host round trips.
  * Randomness is a threaded `jax.random` key (replaces torch generator +
    `seed_everything`, model.py:23-58).
  * The reference's indexing quirks are reproduced exactly:
      - inv_step clamps `t - step_delta` to <= 999 and uses
        final_alpha_cumprod when it goes negative (model.py:123-127);
      - ctrl_step uses final_alpha_cumprod when prev_timestep <= 0
        (strict `> 0` test, model.py:159-160) while _get_variance uses
        `>= 0` (model.py:202-203).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.config import SchedulerConfig


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed DDIM schedule tables.

    `alphas_cumprod` is always float32: schedule math in low precision is a
    classic source of drift over 50 steps, and these are O(1000) scalars.
    """

    num_train_timesteps: int
    num_inference_steps: int
    steps_offset: int
    # float32 [num_train_timesteps]
    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray  # scalar
    # int32 [num_inference_steps], descending (e.g. 981, 961, ..., 1)
    timesteps: jnp.ndarray

    @property
    def step_delta(self) -> int:
        return self.num_train_timesteps // self.num_inference_steps

    @classmethod
    def create(
        cls,
        config: SchedulerConfig = SchedulerConfig(),
        num_inference_steps: int = 50,
    ) -> "DDIMSchedule":
        # scaled_linear: betas are linspace in sqrt space.
        betas = (
            np.linspace(
                config.beta_start**0.5,
                config.beta_end**0.5,
                config.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
        alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        final = (
            np.float32(1.0) if config.set_alpha_to_one else alphas_cumprod[0]
        )
        # "leading" spacing with steps_offset, as diffusers DDIMScheduler
        # set_timesteps does for the SD-1.5 config.
        step_ratio = config.num_train_timesteps // num_inference_steps
        timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
        timesteps = timesteps.astype(np.int32) + config.steps_offset
        return cls(
            num_train_timesteps=config.num_train_timesteps,
            num_inference_steps=num_inference_steps,
            steps_offset=config.steps_offset,
            alphas_cumprod=jnp.asarray(alphas_cumprod),
            final_alpha_cumprod=jnp.asarray(final),
            timesteps=jnp.asarray(timesteps.copy()),
        )

    # -- scalar lookups (work with traced integer t) -------------------------

    def alpha_at(self, t: jnp.ndarray) -> jnp.ndarray:
        """alphas_cumprod[t] with final_alpha_cumprod fallback for t < 0."""
        safe_t = jnp.clip(t, 0, self.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod)

    def alpha_prev_strict(self, t_prev: jnp.ndarray) -> jnp.ndarray:
        """alphas_cumprod[t_prev] using the reference ctrl_step's strict
        `t_prev > 0` test (model.py:159-160)."""
        safe_t = jnp.clip(t_prev, 0, self.num_train_timesteps - 1)
        return jnp.where(
            t_prev > 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod
        )

    def variance(self, t: jnp.ndarray) -> jnp.ndarray:
        """DDPM posterior variance between t and t - step_delta.

        Reference `_get_variance` (model.py:200-209); uses the `>= 0`
        fallback convention.
        """
        t_prev = t - self.step_delta
        alpha_t = self.alpha_at(t)
        alpha_prev = self.alpha_at(t_prev)
        beta_t = 1.0 - alpha_t
        beta_prev = 1.0 - alpha_prev
        return (beta_prev / beta_t) * (1.0 - alpha_t / alpha_prev)


def inv_step(
    schedule: DDIMSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One deterministic DDIM inversion step: x_t -> x_{t+delta}.

    Mirrors reference inv_step (model.py:109-132), including the
    `min(t - delta, 999)` clamp.
    Returns (x_next, pred_x0).
    """
    next_step = timestep
    t = jnp.minimum(
        timestep - schedule.step_delta, schedule.num_train_timesteps - 1
    )
    alpha_t = schedule.alpha_at(t)
    alpha_next = schedule.alpha_at(next_step)
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    pred_x0 = (x32 - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)
    x_next = jnp.sqrt(alpha_next) * pred_x0 + jnp.sqrt(1.0 - alpha_next) * eps
    return x_next.astype(dtype), pred_x0.astype(dtype)


def ctrl_step(
    schedule: DDIMSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    eta: float,
    rng: Optional[jax.Array],
    ddim_streams_from: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hybrid DDIM/DDPM denoise step with a local-perturbation mask.

    DDIM everywhere; inside `mask` the step uses the DDPM direction
    coefficient sqrt(1 - a_prev - sigma^2) and adds sigma * noise.  Streams
    with index >= `ddim_streams_from` (the pinned reference streams) are kept
    pure DDIM with mask treated as all-ones, matching the reference's
    2-stream branch (model.py:169-174).

    Args:
      model_output: [B, H, W, C] predicted noise (post-CFG).
      x:            [B, H, W, C] current latents.
      mask:         [H, W] / [1, H, W] / broadcastable float mask (1 = DDPM
                    region), or None for full DDPM (mask of ones).
      eta:          DDPM noise weight; 0 => pure DDIM (static Python float).
      rng:          PRNG key for the variance noise (required if eta > 0).
      ddim_streams_from: static int or None.

    Returns (x_prev, pred_x0).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)

    t_prev = timestep - schedule.step_delta
    alpha_t = schedule.alpha_at(timestep)
    alpha_prev = schedule.alpha_prev_strict(t_prev)
    beta_t = 1.0 - alpha_t

    pred_x0 = (x32 - jnp.sqrt(beta_t) * eps) / jnp.sqrt(alpha_t)

    variance = schedule.variance(timestep)
    std_dev_t = eta * jnp.sqrt(variance)

    if mask is None:
        mask_b = jnp.ones(x.shape, jnp.float32)
    else:
        m = mask.astype(jnp.float32)
        if m.ndim == 2:  # [H, W] -> [1, H, W, 1] for NHWC latents
            m = m[None, :, :, None]
        mask_b = jnp.broadcast_to(m, x.shape)

    # Per-stream sigma: reference streams are pure DDIM (sigma = 0, mask = 1).
    std_per_stream = jnp.full((x.shape[0],) + (1,) * (x.ndim - 1), std_dev_t)
    if ddim_streams_from is not None:
        stream_ids = jnp.arange(x.shape[0]).reshape(
            (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        is_ref = stream_ids >= ddim_streams_from
        std_per_stream = jnp.where(is_ref, 0.0, std_per_stream)
        mask_b = jnp.where(is_ref, 1.0, mask_b)

    # Direction: DDPM coefficient inside the mask, DDIM outside.
    dir_ddpm = jnp.sqrt(1.0 - alpha_prev - std_per_stream**2) * eps * mask_b
    dir_ddim = jnp.sqrt(1.0 - alpha_prev) * eps * (1.0 - mask_b)
    x_prev = jnp.sqrt(alpha_prev) * pred_x0 + dir_ddpm + dir_ddim

    if eta > 0:
        if rng is None:
            raise ValueError("ctrl_step with eta > 0 requires an rng key")
        noise = jax.random.normal(rng, x.shape, jnp.float32)
        x_prev = x_prev + std_per_stream * noise * mask_b

    return x_prev.astype(dtype), pred_x0.astype(dtype)


def linear_context_guidance(
    i: np.ndarray | int,
    start_step: int,
    end_step: int,
    num_steps: int,
    end_scale: float = 0.5,
) -> np.ndarray:
    """TCA strength schedule — reference `linear_param` (model.py:438-455).

    Piecewise linear: 1.0 at start_step, `end_scale` at end_step, 0.0 at
    num_steps.  When end_step < start_step (the common default, e.g. 10 < 25)
    only the second segment is active, exactly as in the reference.

    Host-side (numpy): the whole schedule is precomputed into a [num_steps]
    array that is scanned over on device.
    """
    i = np.asarray(i, np.float32)
    first = np.where(
        end_step == start_step,
        1.0,
        1.0 + (end_scale - 1.0) / max(end_step - start_step, 1e-9) * (i - start_step),
    )
    second = end_scale + (-end_scale) / max(num_steps - end_step, 1e-9) * (i - end_step)
    return np.where(i <= end_step, first, second).astype(np.float32)


def context_guidance_schedule(
    start_step: int, end_step: int, num_steps: int, end_scale: float = 0.5
) -> np.ndarray:
    """[num_steps] array of context-guidance values (zeros before start)."""
    out = np.zeros(num_steps, np.float32)
    idx = np.arange(start_step, num_steps)
    out[idx] = linear_context_guidance(idx, start_step, end_step, num_steps, end_scale)
    return out
