"""FreeFine-TPU pipelines: the public API.

Mirrors the three reference entry points with identical semantics and
defaults (/root/reference/src/demo/model.py):

  * ``FreeFine.generation``               <- FreeFine_generation (:1012)
  * ``FreeFine.background_generation``    <- FreeFine_background_generation (:1088)
  * ``FreeFine.cross_image_composition``  <- FreeFine_cross_image_composition (:1051)

TPU-first design, not a translation:

  * The whole denoise loop (UNet x K steps + masked hybrid ctrl_step + local
    CFG + TCA schedule) compiles into ONE `lax.scan` per (mode, method,
    num-steps) — no host round trips per step, no per-step re-registration
    of attention processors.
  * Reference-stream pinning ("latents[1:] = ref_latent", model.py:582-586)
    becomes a scanned input: the inversion trajectory is stacked on device
    and sliced per step inside the scan.
  * All editing state (mask pyramids, per-step context_guidance/share-gate)
    is traced data; editing mode/method are static config, so each task
    compiles once and is cached for every subsequent case — the key
    throughput unlock over the reference (which rebuilds controller state
    per case and runs eager per-step Python).
  * Randomness is a threaded `jax.random` key (replaces seed_everything +
    torch generators, model.py:23-58).

Known deviation from the reference (documented): the reference's
compose-mode *local* cross-attention chunks the ""-prompt's keys across
attention heads (src/utils/attention.py:1423-1430 divides `heads` rows by
the number of regions) and crashes outright when the prompt count does not
match the stream count; we implement its documented intent instead — each
target region of the conditional edit stream attends to its own region
prompt (see `edit_cross_attention` compose branch).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu import masks as mask_ops
from freefine_tpu.config import DiTConfig, PipelineConfig, sd15_pipeline_config
from freefine_tpu.edit import (
    DEFAULT_LAYER_RANGE,
    EditConfig,
    EditState,
    build_mask_pyramid,
    build_mask_stack_pyramid,
    nearest_resize,
    none_config,
)
from freefine_tpu.models.text_encoder import CLIPTextEncoder
from freefine_tpu.models.tokenizer import load_tokenizer
from freefine_tpu.models.unet import UNet2DCondition
from freefine_tpu.models.vae import AutoencoderKL, from_uint8, to_uint8
from freefine_tpu.schedulers.ddim import (
    DDIMSchedule,
    context_guidance_schedule,
    ctrl_step,
    inv_step,
)

METHOD_TYPES = ("tca", "mmsa", "mmsa_es", "ssa", "sdsa")


def _method_and_gates(
    method_type: str, start_step: int, end_step: int, num_steps: int, end_scale: float
) -> Tuple[str, np.ndarray, np.ndarray]:
    """Static method name + per-step (context_guidance, share_gate) arrays.

    Reproduces forward_sampling's controller programming
    (model.py:500-520,587-591): tca gets the linear_param schedule;
    mmsa_es flips modulation off for steps >= end_step; plain mmsa/ssa/sdsa
    keep gate 1 throughout.
    """
    k = num_steps - start_step
    steps = np.arange(start_step, num_steps)
    if method_type == "tca":
        cg = context_guidance_schedule(start_step, end_step, num_steps, end_scale)[
            start_step:
        ]
        gates = np.ones(k, np.float32)
        return "tca", cg, gates
    if method_type == "mmsa_es":
        cg = np.zeros(k, np.float32)
        gates = (steps < end_step).astype(np.float32)
        return "mmsa", cg, gates
    cg = np.zeros(k, np.float32)
    gates = np.ones(k, np.float32)
    return method_type, cg, gates


# ---------------------------------------------------------------------------
# Pure jittable loops
# ---------------------------------------------------------------------------

# FREEFINE_SCAN_UNROLL=k unrolls every denoise/invert scan body k steps —
# a perf hypothesis knob (more scheduler headroom between UNet calls vs a
# k-times-larger program).  Paired chip measurement in BATCH_SCALING.md;
# default 1 (no unroll).
_SCAN_UNROLL = int(os.environ.get("FREEFINE_SCAN_UNROLL", "1"))

# FREEFINE_FUSED_PIPELINE=1 compiles DDIM inversion + the edit regeneration
# scan into ONE jitted program for `FreeFine.generation` (trajectory buffer
# stays program-internal, the input latents are donated, and the dispatch
# boundary between the two scans disappears).  Perf hypothesis knob —
# paired chip measurement in BATCH_SCALING.md; default off.
_FUSED_PIPELINE = os.environ.get("FREEFINE_FUSED_PIPELINE", "0") == "1"


def _scan(body, init, xs):
    return jax.lax.scan(body, init, xs, unroll=_SCAN_UNROLL)


def ddim_invert_loop(
    unet_apply,
    params,
    schedule: DDIMSchedule,
    latents: jnp.ndarray,
    text_emb: jnp.ndarray,
    num_actual: int,
) -> jnp.ndarray:
    """DDIM inversion as one scan (reference invert, model.py:817-925, with
    guidance_scale=1.0 as all three tasks use, model.py:1360).

    Returns the stacked trajectory [num_actual+1, B, h, w, c] —
    trajectory[0] is the clean latent, trajectory[-1] the most-noised.
    """
    ts = jnp.flip(schedule.timesteps)[:num_actual]  # ascending: 1, 21, ...

    def body(lat, t):
        eps = unet_apply(params, lat, t, text_emb)
        lat, _ = inv_step(schedule, eps, t, lat)
        return lat, lat

    _, traj = _scan(body, latents, ts)
    return jnp.concatenate([latents[None], traj], axis=0)


def _cfg_model_in(lat: jnp.ndarray, nstr: int) -> jnp.ndarray:
    """Stack the sampling UNet input from the per-stream latents.

    Deduped layout (nstr == len(lat) + 1): append ONE shared reference row
    ([u..., r] -> [u..., r, c_edit] with c_edit fed the edit latent);
    legacy layout (nstr == 2 * len(lat)): double every row.
    """
    if nstr == lat.shape[0] + 1:
        return jnp.concatenate([lat, lat[:1]], axis=0)
    return jnp.concatenate([lat, lat], axis=0)


def _cfg_split(eps: jnp.ndarray, nstr: int):
    """Split the UNet noise output into the (uncond, cond) stream pairs
    that CFG combines.  Deduped layout: nu = [u_e, r], nc = [c_e, r] — the
    shared reference row serves both halves; legacy: even halves."""
    eps = eps.astype(jnp.float32)
    if nstr == 3:
        return eps[:2], jnp.concatenate([eps[2:3], eps[1:2]], axis=0)
    return tuple(jnp.split(eps, 2, axis=0))


def sample_edit_loop(
    unet_apply,
    params,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    traj: jnp.ndarray,            # [K+1, 2, h, w, c] inversion trajectory
    text_emb: jnp.ndarray,        # [3, 77, D] [u, u_ref, edit] (or legacy [4])
    state: EditState,
    cg: jnp.ndarray,              # [K] context guidance schedule
    gates: jnp.ndarray,           # [K] share gates
    completion_cfg: jnp.ndarray,  # [lh, lw] local CFG multiplier
    local_var: jnp.ndarray,       # [lh, lw] DDPM region
    rng: jax.Array,
    *,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
    return_intermediates: bool = False,
) -> jnp.ndarray:
    """Geometric-edit regeneration (reference forward_sampling,
    model.py:476-622) as one scan.  Returns final 2-stream latents, or
    (final, per-step edit-stream latents [K, h, w, c]) when
    return_intermediates (the reference's latents_list, model.py:618).

    Stream layout follows text_emb's leading dim:
      * 3 rows [uncond, uncond_ref, cond_edit] — deduped layout [u_e, r, c_e].
        The reference's 4-stream batch (model.py:536-564) runs the reference
        stream twice with identical latents and identical ("") prompts, so
        its two passes are equal by construction (the local-CFG cross-attn
        even hard-replaces c_r's output with u_r's, attention.py:1391);
        sharing one stream cuts sampling UNet compute by 25% with unchanged
        math (tests/test_stream_dedup.py asserts equality).
      * 4 rows [uncond, uncond, cond_edit, ""] — the legacy reference layout
        [u_e, u_r, c_e, c_r], kept for equivalence testing.
    """
    k = traj.shape[0] - 1
    nstr = jax.tree_util.tree_leaves(text_emb)[0].shape[0]
    ts = schedule.timesteps[start_step : start_step + k]
    # Reference pins stream 1 to refer_latents[i - start_step + 1][1]
    # with refer_latents = trajectory[::-1]  (model.py:582-586,1678).
    refs = jnp.flip(traj[:k], axis=0)[:, 1:]  # [K, 1, h, w, c]
    init = traj[-1]

    cfg_mask = completion_cfg[None, :, :, None]
    var_mask = local_var if local_perturbation else jnp.ones_like(local_var)

    def body(carry, xs):
        lat, key = carry
        t, cgt, gt, ref = xs
        lat = lat.at[1:].set(ref)
        st = dataclasses.replace(state, context_guidance=cgt, share_gate=gt)
        model_in = _cfg_model_in(lat, nstr)
        eps = unet_apply(params, model_in, t, text_emb, ecfg, st)
        nu, nc = _cfg_split(eps, nstr)
        if local_text_edit:
            noise = nu + guidance_scale * (nc - nu) * cfg_mask
        else:
            noise = nu + guidance_scale * (nc - nu)
        key, sub = jax.random.split(key)
        lat, _ = ctrl_step(
            schedule, noise, t, lat, var_mask, eta, sub, ddim_streams_from=1
        )
        return (lat, key), (lat[0] if return_intermediates else None)

    (lat, _), inter = _scan(body, (init, rng), (ts, cg, gates, refs))
    if return_intermediates:
        return lat, inter
    return lat


def _extract_ref_kv(intermediates) -> dict:
    """Collect sown ``ref_kv_<block_index>`` entries (any module nesting)
    from a batch-1 capture pass into {block_index: (k [S, E], v [S, E])}."""
    out = {}

    def walk(node):
        for name, val in node.items():
            if name.startswith("ref_kv_"):
                (kv,) = val  # flax sow stores a 1-tuple per call
                k, v = kv
                out[int(name[len("ref_kv_"):])] = (k[0], v[0])
            elif hasattr(val, "items"):
                walk(val)

    walk(intermediates)
    return out


def sample_edit_loop_shared(
    unet_edit,
    unet_capture,
    params,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    ref_traj: jnp.ndarray,        # [K+1, h, w, c] reference inversion traj
    init_lat: jnp.ndarray,        # [B, h, w, c] per-case coarse traj[-1]
    text_pair: jnp.ndarray,       # [B, 2, 77, D] per-case [uncond, cond]
    text_ref: jnp.ndarray,        # [1, 77, D] uncond ctx for the ref pass
    states: EditState,            # [B]-stacked mask pyramids
    cg: jnp.ndarray,              # [K]
    gates: jnp.ndarray,           # [K]
    completion_cfg: jnp.ndarray,  # [B, lh, lw]
    local_var: jnp.ndarray,       # [B, lh, lw]
    rngs: jnp.ndarray,            # [B] per-case keys
    *,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
) -> jnp.ndarray:
    """Shared-reference regeneration over B same-source cases.

    The reference stream of `sample_edit_loop` is re-pinned to its inverted
    latent at every step (model.py:582-586), runs vanilla self-attention,
    and its stepped output is discarded — so for cases that edit the SAME
    source image it is the same computation B times.  Here it runs ONCE per
    step: a standalone capture pass sows its TCA-layer K/V
    (EditConfig.store_kv), and each case's 2-stream [u_e, c_e] pass consumes
    them via EditState.ref_kv (EditConfig.shared_ref).  Exact by
    construction (tests/test_shared_ref.py pins it against the per-case
    3-stream loop); per-case UNet cost drops from 3 to 2 + 1/B streams.

    Per-case DDPM noise stays bit-identical to the per-case loop: ctrl_step
    is fed a 2-row [edit, ref] stack so the RNG draw has the same shape and
    the same per-stream rows as the deduped 3-stream layout.
    """
    k_steps = ref_traj.shape[0] - 1
    refs = jnp.flip(ref_traj[:k_steps], axis=0)       # [K, h, w, c]
    return _shared_ref_scan(
        unet_edit, unet_capture, params, schedule, ecfg, refs, init_lat,
        text_pair, text_ref, states, cg, gates, completion_cfg, local_var,
        rngs, start_step=start_step, guidance_scale=guidance_scale,
        eta=eta, local_text_edit=local_text_edit,
        local_perturbation=local_perturbation,
    )


def _shared_ref_scan(
    unet_edit,
    unet_capture,
    params,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    refs: jnp.ndarray,            # [K, h, w, c] per-step pinned ref latents
    init_lat: jnp.ndarray,        # [B, h, w, c]
    text_pair,                    # [B, 2, ...] pytree
    text_ref,                     # [1, ...] pytree (capture pass)
    states: EditState,
    cg: jnp.ndarray,
    gates: jnp.ndarray,
    completion_cfg: jnp.ndarray,
    local_var: jnp.ndarray,
    rngs: jnp.ndarray,
    *,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
) -> jnp.ndarray:
    """The shared-reference denoise scan common to the edit and bggen
    shared lanes: per step, ONE reference K/V capture pass + per-case
    2-stream [u, c] CFG passes consuming it, stepped by ctrl_step on a
    2-row [case, ref] stack (bit-compatible per-case DDPM noise).  The
    lanes differ only in `refs` indexing and the `init_lat` source."""
    k_steps = refs.shape[0]
    ts = schedule.timesteps[start_step : start_step + k_steps]
    cfg_masks = completion_cfg[:, :, :, None]         # [B, lh, lw, 1]
    var_masks = (
        local_var if local_perturbation else jnp.ones_like(local_var)
    )

    def body(carry, xs):
        lat, keys = carry             # [B, h, w, c], [B] keys
        t, cgt, gt, ref = xs
        kvs = unet_capture(params, ref[None], t, text_ref)

        def case(lat1, txt2, st, cfgm):
            st = dataclasses.replace(
                st, context_guidance=cgt, share_gate=gt, ref_kv=kvs
            )
            eps = unet_edit(
                params, jnp.stack([lat1, lat1]), t, txt2, ecfg, st
            ).astype(jnp.float32)
            nu, nc = eps[0], eps[1]
            if local_text_edit:
                return nu + guidance_scale * (nc - nu) * cfgm
            return nu + guidance_scale * (nc - nu)

        noise = jax.vmap(case)(lat, text_pair, states, cfg_masks)

        def step(noise1, lat1, vm, key):
            key, sub = jax.random.split(key)
            x2 = jnp.stack([lat1, ref])
            n2 = jnp.stack([noise1, jnp.zeros_like(noise1)])
            new, _ = ctrl_step(
                schedule, n2, t, x2, vm, eta, sub, ddim_streams_from=1
            )
            return new[0], key

        lat, keys = jax.vmap(step)(noise, lat, var_masks, keys)
        return (lat, keys), None

    (lat, _), _ = _scan(body, (init_lat, rngs), (ts, cg, gates, refs))
    return lat


def sample_bggen_loop_shared(
    unet_edit,
    unet_capture,
    params,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    ref_traj: jnp.ndarray,        # [K+1, h, w, c] source inversion traj
    text_pair,                    # [B, 2, ...] per-case [uncond, cond] pytree
    text_ref,                     # [1, ...] uncond ctx pytree (capture pass)
    states: EditState,            # [B]-stacked mask pyramids
    cg: jnp.ndarray,
    gates: jnp.ndarray,
    local_cfg: jnp.ndarray,       # [B, lh, lw]
    local_var: jnp.ndarray,       # [B, lh, lw]
    rngs: jnp.ndarray,
    *,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
) -> jnp.ndarray:
    """Shared-source background generation over B removal cases of ONE
    source image.

    In the per-case loop (`sample_bggen_loop` / forward_sampling_background
    _gen, model.py:656-812) the reference stream at step i is the SOURCE
    inversion latent at the matching noise level (refer_latents[i - start],
    model.py:756) — for cases removing different objects from the same
    image it is the same computation B times, and even the generated
    stream's INIT (traj[-1]) is shared.  Here the reference runs once per
    step as a K/V capture pass; each case runs a 2-stream [u_g, c_g] pass
    consuming them (EditConfig.shared_ref; _tca_bggen's shared branch).
    Like the edit shared lane this implies ref_vanilla reference-stream
    semantics; per-case DDPM noise stays bit-compatible with the per-case
    lane via the 2-row [gen, ref] ctrl_step stack."""
    refs = jnp.flip(ref_traj[1:], axis=0)             # [K, h, w, c]
    b = jax.tree_util.tree_leaves(text_pair)[0].shape[0]
    init = jnp.broadcast_to(
        ref_traj[-1][None], (b,) + ref_traj.shape[1:]
    )
    return _shared_ref_scan(
        unet_edit, unet_capture, params, schedule, ecfg, refs, init,
        text_pair, text_ref, states, cg, gates, local_cfg, local_var,
        rngs, start_step=start_step, guidance_scale=guidance_scale,
        eta=eta, local_text_edit=local_text_edit,
        local_perturbation=local_perturbation,
    )


def sample_bggen_loop(
    unet_apply,
    params,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    traj: jnp.ndarray,        # [K+1, 1, h, w, c]
    text_emb: jnp.ndarray,    # [3, 77, D] [u, u_ref, cond] (or legacy [4])
    state: EditState,
    cg: jnp.ndarray,
    gates: jnp.ndarray,
    local_cfg: jnp.ndarray,   # [lh, lw]
    local_var: jnp.ndarray,   # [lh, lw]
    rng: jax.Array,
    *,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
    return_intermediates: bool = False,
) -> jnp.ndarray:
    """Background generation / removal (forward_sampling_background_gen,
    model.py:656-812).  The reference stream at step i is the inverted
    latent at the *matching* noise level (refer_latents[i - start_step],
    model.py:757).  With return_intermediates, also returns the per-step
    generated-stream latents [K, h, w, c] (the reference's latents_list,
    model.py:808).

    Stream layout follows text_emb's leading dim, as in `sample_edit_loop`:
    3 rows -> deduped [u_g, r, c_g]; 4 rows -> legacy [u_g, u_r, c_g, c_r]."""
    k = traj.shape[0] - 1
    nstr = jax.tree_util.tree_leaves(text_emb)[0].shape[0]
    ts = schedule.timesteps[start_step : start_step + k]
    refs = jnp.flip(traj[1:], axis=0)  # [K, 1, h, w, c]
    init = traj[-1]

    cfg_mask = local_cfg[None, :, :, None]
    var_mask = local_var if local_perturbation else jnp.ones_like(local_var)

    def body(carry, xs):
        lat, key = carry
        t, cgt, gt, ref = xs
        lat2 = jnp.concatenate([lat, ref], axis=0)
        st = dataclasses.replace(state, context_guidance=cgt, share_gate=gt)
        model_in = _cfg_model_in(lat2, nstr)
        eps = unet_apply(params, model_in, t, text_emb, ecfg, st)
        nu, nc = _cfg_split(eps, nstr)
        if local_text_edit:
            noise = nu + guidance_scale * (nc - nu) * cfg_mask
        else:
            noise = nu + guidance_scale * (nc - nu)
        key, sub = jax.random.split(key)
        lat2, _ = ctrl_step(
            schedule, noise, t, lat2, var_mask, eta, sub, ddim_streams_from=1
        )
        return (lat2[:1], key), (
            lat2[0] if return_intermediates else None
        )

    (lat, _), inter = _scan(body, (init, rng), (ts, cg, gates, refs))
    if return_intermediates:
        return lat, inter
    return lat


def sample_compose_loop(
    unet_apply,
    params,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    traj: jnp.ndarray,            # [K+1, N+1, h, w, c]
    text_emb: jnp.ndarray,        # [N+2, 77, D] per-stream context
    text_extra: jnp.ndarray,      # [P, 77, D] region prompts for cond stream
    state: EditState,
    cg: jnp.ndarray,
    gates: jnp.ndarray,
    completion_cfg: jnp.ndarray,
    local_var: jnp.ndarray,
    rng: jax.Array,
    *,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
    return_intermediates: bool = False,
) -> jnp.ndarray:
    """N-image composition (forward_sampling_compose, model.py:301-435).
    Stream layout per step: [edit, ref_1..ref_N, cond_edit].  With
    return_intermediates, also returns the per-step edit-stream latents
    [K, h, w, c] (the reference's latents_list, model.py:431)."""
    k = traj.shape[0] - 1
    ts = schedule.timesteps[start_step : start_step + k]
    refs = jnp.flip(traj[:k], axis=0)[:, 1:]  # [K, N, h, w, c]
    init = traj[-1][:1]

    cfg_mask = completion_cfg[None, :, :, None]
    var_mask = local_var if local_perturbation else jnp.ones_like(local_var)

    def body(carry, xs):
        lat, key = carry  # [1, h, w, c]
        t, cgt, gt, ref = xs
        lat_full = jnp.concatenate([lat, ref], axis=0)       # [N+1, ...]
        st = dataclasses.replace(state, context_guidance=cgt, share_gate=gt)
        model_in = jnp.concatenate([lat_full, lat], axis=0)  # [N+2, ...]
        eps = unet_apply(params, model_in, t, text_emb, ecfg, st, text_extra)
        eps = eps.astype(jnp.float32)
        nu, nc = eps[:1], eps[-1:]
        if local_text_edit:
            noise = nu + guidance_scale * (nc - nu) * cfg_mask
        else:
            noise = nu + guidance_scale * (nc - nu)
        key, sub = jax.random.split(key)
        lat, _ = ctrl_step(schedule, noise, t, lat, var_mask, eta, sub)
        return (lat, key), (lat[0] if return_intermediates else None)

    (lat, _), inter = _scan(body, (init, rng), (ts, cg, gates, refs))
    if return_intermediates:
        return lat, inter
    return lat


# ---------------------------------------------------------------------------
# The host-facing pipeline
# ---------------------------------------------------------------------------


class FreeFine:
    """Training-free geometric image editing on TPU.

    Construct with converted SD-1.5 weights (see
    `freefine_tpu.weights.load_sd15`) or with `init_random=True` for
    weight-free structural runs (tests / throughput benches).
    """

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        params: Optional[dict] = None,
        tokenizer_path: Optional[str] = None,
        init_random: bool = False,
        seed: int = 0,
    ):
        self.config = config or sd15_pipeline_config()
        if isinstance(self.config.unet, DiTConfig):
            # backbone swap (reference README TODO): same editing hooks,
            # same loops — only the denoiser module changes
            from freefine_tpu.models.dit import DiT2DCondition

            self.unet = DiT2DCondition(config=self.config.unet)
        else:
            self.unet = UNet2DCondition(config=self.config.unet)
        self.vae = AutoencoderKL(config=self.config.vae)
        from freefine_tpu.models.t5 import T5Config, T5Encoder

        if isinstance(self.config.text, T5Config):
            # PixArt lane: T5 caption tower (pixart_pipeline_config)
            self.text_encoder = T5Encoder(config=self.config.text)
            self._text_is_t5 = True
        else:
            self.text_encoder = CLIPTextEncoder(config=self.config.text)
            self._text_is_t5 = False
        self.tokenizer = load_tokenizer(
            tokenizer_path,
            vocab_size=self.config.text.vocab_size,
            max_length=self.config.text.max_length,
        )
        if params is None:
            if not init_random:
                raise ValueError(
                    "Pass converted params (freefine_tpu.weights.load_sd15) "
                    "or init_random=True for weight-free runs."
                )
            params = self.init_params(jax.random.key(seed))
        self.params = params
        self._jit_cache = {}
        self._schedules = {}
        self.serving = None  # set by use_mesh (parallel/serve.py)
        # Backbone-appropriate TCA layer window: the (10, 16) default is the
        # SD-UNet's global attention indexing (16 blocks, late-decoder window
        # 10..15 = reference start_layer=10, attention.py:656-658).  A DiT
        # has `depth` uniform blocks, so gate the same *fraction* of late
        # layers instead of the literal indices.
        lo, hi = DEFAULT_LAYER_RANGE
        if isinstance(self.config.unet, DiTConfig):
            d = self.config.unet.depth
            self._layer_range = (round(lo / hi * d), d)
        else:
            # Depth-weighted layer indices (UNetConfig.attn_layer_layout):
            # the reference's start-10-of-16 becomes the same decoder
            # fraction of the backbone's real layout.  SD-1.5 resolves to
            # the literal (10, 16); SDXL (70 depth-weighted layers, decoder
            # at 34..69) to (44, 70) — with the former fixed (10, 16) range
            # no SDXL decoder layer was ever gated, i.e. TCA was inert on
            # the SDXL backbone.
            total, _up_start = self.config.unet.attn_layer_layout
            self._layer_range = (round(lo / hi * total), total)

    def _edit_config(self, **kw) -> EditConfig:
        """EditConfig with the backbone-appropriate default layer_range."""
        kw.setdefault("layer_range", self._layer_range)
        return EditConfig(**kw)

    def use_mesh(
        self,
        spec: str = "data=1,model=1",
        devices=None,
        strict: bool = True,
        sequence_parallel: bool = False,
        sp_min_seq: int = 2048,
    ) -> "FreeFine":
        """Serve this pipeline on a (data x model) device mesh.

        Commits the denoiser params with the Megatron-style TP layout
        (parallel/tp.py; strict — unrecognised projection names raise) and
        the VAE/text towers replicated; the batched lanes then shard their
        case-stacked inputs over 'data' (parallel/serve.py), and — when
        `sequence_parallel` — self-attention sequences >= sp_min_seq shard
        the token axis over 'model' (parallel/sp.py allgather-KV).  All
        existing entry points work unchanged: jit adopts the committed
        shardings.  Replaces the reference's torchrun case-DP
        (freefine_batch_infer_2d.py:141-145) and extends it with the
        intra-model axes.  Returns self.
        """
        from freefine_tpu.ops.attention import set_sequence_parallel
        from freefine_tpu.parallel.serve import build_serving

        self.serving = build_serving(spec, devices=devices)
        placed = {}
        for name, tree in self.params.items():
            placed[name] = self.serving.shard_params(
                tree, strict=strict and name == "unet"
            )
        self.params = placed
        self._jit_cache.clear()
        set_sequence_parallel(
            self.serving.mesh if sequence_parallel else None,
            min_seq=sp_min_seq,
        )
        return self

    # -- setup ---------------------------------------------------------------

    def init_params(self, rng) -> dict:
        cfg = self.config
        lh, lw = cfg.latent_height, cfg.latent_width
        r1, r2, r3 = jax.random.split(rng, 3)
        sample = jnp.zeros((1, lh, lw, cfg.unet.in_channels), cfg.unet.dtype)
        ctx = jnp.zeros((1, 77, cfg.unet.cross_attention_dim), cfg.unet.dtype)
        img = jnp.zeros((1, cfg.height, cfg.width, 3), cfg.vae.dtype)
        ids = jnp.zeros((1, cfg.text.max_length), jnp.int32)
        return {
            "unet": self.unet.init(r1, sample, jnp.int32(1), ctx),
            "vae": self.vae.init(r2, img),
            "text": self.text_encoder.init(r3, ids),
        }

    @staticmethod
    def _split_text(text_emb):
        """Text conditioning may be a plain context array or a
        (context, added_cond) tuple (SDXL micro-conditioning)."""
        if isinstance(text_emb, tuple):
            return text_emb
        return text_emb, None

    def _unet_apply_plain(self, params, sample, t, ctx):
        ctx, added = self._split_text(ctx)
        return self.unet.apply(params["unet"], sample, t, ctx, added_cond=added)

    def _make_unet_apply(self, ecfg: EditConfig):
        def apply(params, sample, t, ctx, _ecfg, state, ctx_extra=None):
            ctx, added = self._split_text(ctx)
            if ctx_extra is not None:
                ctx_extra = self._split_text(ctx_extra)[0]
            return self.unet.apply(
                params["unet"], sample, t, ctx,
                edit_cfg=ecfg, edit_state=state, context_extra=ctx_extra,
                added_cond=added,
            )
        return apply

    def _make_unet_capture(self, cap_cfg: EditConfig):
        """Reference-stream K/V capture pass for the shared-source lane.

        Returns {block_index: (k, v)} sown at the TCA-gated self-attention
        layers.  The eps output is dropped, so XLA dead-code-eliminates all
        UNet compute past the last captured layer."""
        def apply(params, sample, t, ctx):
            ctx, added = self._split_text(ctx)
            _, variables = self.unet.apply(
                params["unet"], sample, t, ctx,
                edit_cfg=cap_cfg, edit_state=None, added_cond=added,
                mutable=["intermediates"],
            )
            return _extract_ref_kv(variables["intermediates"])
        return apply

    # -- jitted stages --------------------------------------------------------

    def _jit(self, key, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def encode_text(self, texts: Sequence[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer.batch_encode(list(texts)))
        if self._text_is_t5:
            # T5 pads with id 0; padded keys are masked out (the PixArt
            # pipeline feeds the tokenizer attention_mask through)
            fn = self._jit(
                "text",
                lambda p, i: self.text_encoder.apply(
                    p["text"], i, (i != 0).astype(jnp.float32)
                ),
            )
        else:
            fn = self._jit(
                "text", lambda p, i: self.text_encoder.apply(p["text"], i)
            )
        return fn(self.params, ids)

    def image_to_latent(self, image: np.ndarray) -> jnp.ndarray:
        """uint8/float HWC or BHWC image -> scaled latents [B, lh, lw, 4].

    Reference image2latent (model.py:223-268)."""
        x = from_uint8(jnp.asarray(image)) if image.dtype == np.uint8 else jnp.asarray(image)
        if x.ndim == 3:
            x = x[None]
        fn = self._jit(
            "vae_enc",
            lambda p, v: self.vae.apply(p["vae"], v, method=self.vae.encode),
        )
        return fn(self.params, x).astype(jnp.float32)

    def latent_to_image(self, latents: jnp.ndarray) -> np.ndarray:
        """Scaled latents -> uint8 images (reference latent2image,
        model.py:269-280)."""
        fn = self._jit(
            "vae_dec",
            lambda p, z: to_uint8(self.vae.apply(p["vae"], z, method=self.vae.decode)),
        )
        return np.asarray(fn(self.params, latents))

    def invert(self, latents: jnp.ndarray, num_step: int, start_step: int) -> jnp.ndarray:
        """DDIM-invert for (num_step - start_step) steps, return trajectory."""
        num_actual = num_step - start_step
        schedule = self._schedule(num_step)
        key = ("invert", num_step, num_actual, latents.shape)
        if key not in self._jit_cache:
            unet_apply = self._unet_apply_plain
            self._jit_cache[key] = jax.jit(
                lambda p, lat, emb: ddim_invert_loop(
                    unet_apply, p, schedule, lat, emb, num_actual
                )
            )
        emb = self._inversion_text_embeddings(latents.shape[0])
        return self._jit_cache[key](self.params, latents, emb)

    def _inversion_text_embeddings(self, batch: int):
        """Per-stream unconditional context for DDIM inversion
        (guidance 1.0, model.py:1360)."""
        uncond = self.encode_text([""])
        return jnp.tile(uncond, (batch, 1, 1))

    def _stream_text_embeddings(self, texts: Sequence[str]):
        """Per-stream conditioning for the compose loop (hook point for the
        SDXL dual-encoder pipeline)."""
        return self.encode_text(texts)

    def _extra_text_embeddings(self, texts: Sequence[str]):
        """Region-prompt K/V source for compose local cross-attention."""
        return self.encode_text(texts)

    def _schedule(self, num_step: int) -> DDIMSchedule:
        if num_step not in self._schedules:
            self._schedules[num_step] = DDIMSchedule.create(
                self.config.scheduler, num_inference_steps=num_step
            )
        return self._schedules[num_step]

    # -- resizing helpers ------------------------------------------------------

    def _prep_image(self, img: np.ndarray) -> np.ndarray:
        """To [H, W, 3] uint8 at the pipeline resolution."""
        cfg = self.config
        a = np.asarray(img)
        if a.ndim == 2:
            a = np.stack([a] * 3, -1)
        if a.shape[:2] != (cfg.height, cfg.width):
            t = jax.image.resize(
                jnp.asarray(a, jnp.float32),
                (cfg.height, cfg.width, a.shape[-1]),
                method="lanczos3",
            )
            a = np.asarray(jnp.clip(jnp.round(t), 0, 255)).astype(np.uint8)
        return a

    # -- public API ------------------------------------------------------------

    def generation(
        self,
        ori_img: np.ndarray,
        ori_mask: np.ndarray,
        coarse_input: np.ndarray,
        target_mask: np.ndarray,
        guidance_text: str,
        guidance_scale: float = 7.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 25,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        draw_mask: Optional[np.ndarray] = None,
        use_auto_draw: bool = False,
        cons_area: Optional[np.ndarray] = None,
        reduce_inp_artifacts: bool = False,
        end_scale: float = 0.5,
        seed: int = 42,
        return_ori: bool = False,
        return_intermediates: bool = False,
    ):
        """Geometric edit refinement — reference FreeFine_generation
        (model.py:1012-1049).  Returns the edited uint8 image (and the
        reconstructed reference image when return_ori; and the per-step
        latent-preview frames when return_intermediates, the reference's
        intermediate-GIF instrument, model.py:1174-1225)."""
        assert method_type in METHOD_TYPES, method_type
        cfg = self.config
        lh, lw = cfg.latent_height, cfg.latent_width

        coarse = self._prep_image(coarse_input)
        ori = self._prep_image(ori_img)
        lat2 = self.image_to_latent(np.stack([coarse, ori]))  # one VAE batch
        traj = None if _FUSED_PIPELINE else self.invert(
            lat2, num_step, start_step
        )

        em = mask_ops.prepare_various_mask(
            jnp.asarray(target_mask), jnp.asarray(ori_mask),
            None if draw_mask is None else jnp.asarray(draw_mask),
            cfg.height, cfg.width, lh, lw,
            use_auto_draw=use_auto_draw,
            cons_area=None if cons_area is None else jnp.asarray(cons_area),
            reduce_inp_artifacts=reduce_inp_artifacts,
        )
        state = EditState(
            fg_retain=build_mask_pyramid(em.fg_retain, lh, lw),
            fg_ref=build_mask_pyramid(em.fg_ref, lh, lw),
            local_region=build_mask_pyramid(em.fg_retain, lh, lw),
        )
        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        ecfg = self._edit_config(
            mode="edit", method=method, local_cfg=local_text_edit
        )
        text_emb = self._edit_text_embeddings(guidance_text)

        key = (
            "edit_fused" if _FUSED_PIPELINE else "edit",
            num_step, start_step, ecfg, guidance_scale, eta,
            local_text_edit, local_perturbation, return_intermediates,
        )
        if key not in self._jit_cache:
            unet_apply = self._make_unet_apply(ecfg)
            schedule = self._schedule(num_step)
            fn = functools.partial(
                sample_edit_loop, unet_apply,
                start_step=start_step, guidance_scale=guidance_scale,
                eta=eta, local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
                return_intermediates=return_intermediates,
            )
            if _FUSED_PIPELINE:
                unet_plain = self._unet_apply_plain
                num_actual = num_step - start_step

                def fused(p, lat, inv_emb, *a, _fn=fn, _s=schedule):
                    tr = ddim_invert_loop(
                        unet_plain, p, _s, lat, inv_emb, num_actual
                    )
                    return _fn(p, _s, ecfg, tr, *a)

                self._jit_cache[key] = jax.jit(fused, donate_argnums=(1,))
            else:
                self._jit_cache[key] = jax.jit(
                    lambda p, *a, _fn=fn, _s=schedule, _e=ecfg: _fn(p, _s, _e, *a)
                )
        head = (
            (lat2, self._inversion_text_embeddings(2))
            if _FUSED_PIPELINE else (traj,)
        )
        out = self._jit_cache[key](
            self.params, *head, text_emb, state,
            jnp.asarray(cg), jnp.asarray(gates),
            em.completion_cfg, em.local_var, jax.random.key(seed),
        )
        inter = None
        if return_intermediates:
            lat, inter_lat = out
            from freefine_tpu.utils.vis import latent_to_preview

            inter = latent_to_preview(inter_lat)
        else:
            lat = out
        imgs = self.latent_to_image(lat)
        rets = [imgs[0]]
        if return_ori:
            rets.append(imgs[1])
        if return_intermediates:
            rets.append(inter)
        return rets[0] if len(rets) == 1 else tuple(rets)

    def background_generation(
        self,
        ori_img: np.ndarray,
        ori_mask: np.ndarray,
        guidance_text: str,
        guidance_scale: float = 3.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 1,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        end_scale: float = 0.5,
        seed: int = 42,
    ) -> np.ndarray:
        """Object removal / background inpainting — reference
        FreeFine_background_generation (model.py:1088-1120)."""
        assert method_type in METHOD_TYPES, method_type
        cfg = self.config
        lh, lw = cfg.latent_height, cfg.latent_width

        ori = self._prep_image(ori_img)
        lat = self.image_to_latent(ori)
        traj = self.invert(lat, num_step, start_step)

        mask_full, local_var = mask_ops.prepare_mask_bggen(
            jnp.asarray(ori_mask), cfg.height, cfg.width, lh, lw
        )
        pyr = build_mask_pyramid(mask_full, lh, lw)
        state = EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr)
        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        ecfg = self._edit_config(
            mode="bggen", method=method, local_cfg=local_text_edit
        )
        text_emb = self._edit_text_embeddings(guidance_text)

        key = (
            "bggen", num_step, start_step, ecfg, guidance_scale, eta,
            local_text_edit, local_perturbation,
        )
        if key not in self._jit_cache:
            unet_apply = self._make_unet_apply(ecfg)
            schedule = self._schedule(num_step)
            fn = functools.partial(
                sample_bggen_loop, unet_apply,
                start_step=start_step, guidance_scale=guidance_scale,
                eta=eta, local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
            )
            self._jit_cache[key] = jax.jit(
                lambda p, *a, _fn=fn, _s=schedule, _e=ecfg: _fn(p, _s, _e, *a)
            )
        out = self._jit_cache[key](
            self.params, traj, text_emb, state,
            jnp.asarray(cg), jnp.asarray(gates),
            local_var, local_var, jax.random.key(seed),
        )
        return self.latent_to_image(out)[0]

    def cross_image_composition(
        self,
        img_lists: Sequence[np.ndarray],
        ori_mask_lists: Sequence[np.ndarray],
        tgt_mask_lists: Sequence[np.ndarray],
        coarse_input: np.ndarray,
        guidance_text_list: Sequence[str],
        guidance_scale: float = 7.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 25,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        draw_mask: Optional[Sequence[np.ndarray]] = None,
        end_scale: float = 0.5,
        dil_completion: bool = False,
        dil_factor: int = 15,
        appearance_transfer: bool = False,
        seed: int = 42,
    ) -> np.ndarray:
        """N-image composition / appearance transfer — reference
        FreeFine_cross_image_composition (model.py:1051-1086)."""
        assert method_type in METHOD_TYPES, method_type
        cfg = self.config
        lh, lw = cfg.latent_height, cfg.latent_width
        n = len(img_lists)

        coarse = self._prep_image(coarse_input)
        lats = [self.image_to_latent(coarse)]
        for im in img_lists:
            lats.append(self.image_to_latent(self._prep_image(im)))
        traj = self.invert(jnp.concatenate(lats, axis=0), num_step, start_step)

        cm = mask_ops.prepare_composition_masks(
            [jnp.asarray(m) for m in ori_mask_lists],
            [jnp.asarray(m) for m in tgt_mask_lists],
            cfg.height, cfg.width, lh, lw,
            dil_completion=dil_completion,
            dil_factor=dil_factor,
            draw_masks=None if draw_mask is None else [jnp.asarray(m) for m in draw_mask],
            appearance_transfer=appearance_transfer,
        )
        state = EditState(
            src_masks=build_mask_stack_pyramid(cm.src_masks, lh, lw),
            tgt_masks=build_mask_stack_pyramid(cm.tgt_masks, lh, lw),
        )
        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        prompts = list(guidance_text_list) + [""]
        p = len(prompts)
        assert cm.tgt_masks.shape[0] >= p, (
            f"{p} region prompts vs {cm.tgt_masks.shape[0]} target regions"
        )
        ecfg = self._edit_config(
            mode="compose", method=method, local_cfg=local_text_edit,
            num_streams=n + 2, num_sources=n, prompt_length=p,
        )
        # Per-stream context: [uncond, prompt_1..prompt_N (pad ""), uncond].
        stream_texts = [""] + (
            list(guidance_text_list) + [""] * n
        )[:n] + [""]
        text_emb = self._stream_text_embeddings(stream_texts)
        text_extra = self._extra_text_embeddings(prompts)

        key = (
            "compose", num_step, start_step, ecfg, guidance_scale, eta,
            local_text_edit, local_perturbation,
        )
        if key not in self._jit_cache:
            unet_apply = self._make_unet_apply(ecfg)
            schedule = self._schedule(num_step)
            fn = functools.partial(
                sample_compose_loop, unet_apply,
                start_step=start_step, guidance_scale=guidance_scale,
                eta=eta, local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
            )
            self._jit_cache[key] = jax.jit(
                lambda p, *a, _fn=fn, _s=schedule, _e=ecfg: _fn(p, _s, _e, *a)
            )
        out = self._jit_cache[key](
            self.params, traj, text_emb, text_extra, state,
            jnp.asarray(cg), jnp.asarray(gates),
            cm.completion_cfg, cm.local_var, jax.random.key(seed),
        )
        return self.latent_to_image(out)[0]

    def guided_generation(
        self,
        ori_img: np.ndarray,
        ori_mask: np.ndarray,
        coarse_input: np.ndarray,
        target_mask: np.ndarray,
        guidance_text: str,
        energy_scale: float = 2.0,
        energy_fraction: float = 0.6,
        guidance_scale: float = 7.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 25,
        method_type: str = "tca",
        use_auto_draw: bool = True,
        cons_area: Optional[np.ndarray] = None,
        end_scale: float = 0.5,
        seed: int = 42,
    ) -> np.ndarray:
        """Geometric edit with DragonDiffusion-parity energy guidance on top
        of the TCA regeneration: feature-cosine gradients (ops/guidance)
        are added to the noise prediction for the first `energy_fraction`
        of denoise steps (reference Sampler.py:74-90 applies guidance while
        i < 30 of 50)."""
        assert method_type in METHOD_TYPES, method_type
        if isinstance(self.config.unet, DiTConfig):
            raise NotImplementedError(
                "guided_generation needs the UNet backbone's intermediate "
                "feature taps (return_features/h_sample) for the energy "
                "gradients; the DiT backbone does not expose them.  Use a "
                "UNet pipeline config, or generation() on the DiT."
            )
        cfg = self.config
        lh, lw = cfg.latent_height, cfg.latent_width

        coarse = self._prep_image(coarse_input)
        ori = self._prep_image(ori_img)
        lat2 = self.image_to_latent(np.stack([coarse, ori]))  # one VAE batch
        traj = self.invert(lat2, num_step, start_step)

        em = mask_ops.prepare_various_mask(
            jnp.asarray(target_mask), jnp.asarray(ori_mask), None,
            cfg.height, cfg.width, lh, lw,
            use_auto_draw=use_auto_draw,
            cons_area=jnp.asarray(
                cons_area if cons_area is not None
                else np.zeros((cfg.height, cfg.width), np.float32)
            ),
        )
        state = EditState(
            fg_retain=build_mask_pyramid(em.fg_retain, lh, lw),
            fg_ref=build_mask_pyramid(em.fg_ref, lh, lw),
            local_region=build_mask_pyramid(em.fg_retain, lh, lw),
        )
        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        ecfg = self._edit_config(mode="edit", method=method, local_cfg=True)
        text_emb = self._edit_text_embeddings(guidance_text)
        energy_until = int(round((num_step - start_step) * energy_fraction))
        emasks = _guided_energy_masks(cfg, em)

        key = (
            "guided", num_step, start_step, ecfg, guidance_scale, eta,
            energy_scale, energy_until,
        )
        if key not in self._jit_cache:
            unet_apply = self._make_unet_apply(ecfg)
            schedule = self._schedule(num_step)

            def unet_feat(p, s, t, emb, return_features=False):
                return self.unet.apply(
                    p["unet"], s, t, emb, return_features=return_features
                )

            fn = functools.partial(
                sample_guided_loop, unet_apply, unet_feat,
                start_step=start_step, guidance_scale=guidance_scale,
                eta=eta, energy_scale=energy_scale,
                energy_until=energy_until,
            )
            self._jit_cache[key] = jax.jit(
                lambda p, *a, _fn=fn, _s=schedule, _e=ecfg: _fn(p, _s, _e, *a)
            )
        lat = self._jit_cache[key](
            self.params, traj, text_emb, state,
            jnp.asarray(cg), jnp.asarray(gates),
            em.completion_cfg, em.local_var, emasks, jax.random.key(seed),
        )
        return self.latent_to_image(lat)[0]

    # -- helpers ----------------------------------------------------------------

    def attention_maps(
        self,
        sample: jnp.ndarray,
        t,
        text_emb,
        ecfg: Optional[EditConfig] = None,
        state: Optional[EditState] = None,
    ):
        """One UNet forward with the attention-map instrument on — the
        reference's AttentionStore probe (attention.py:565-638).

        Returns (eps, {"{place}_{self|cross}": [head-averaged <=32x32 maps
        in layer order]}).  For step-averaged maps across a loop, feed each
        step's intermediates to `utils.attn_store.AttentionStore`."""
        import dataclasses as _dc

        from freefine_tpu.utils.attn_store import collect_maps

        ecfg = _dc.replace(ecfg or EditConfig(), store_attention=True)
        ctx, added = self._split_text(text_emb)
        out, vs = self.unet.apply(
            self.params["unet"], sample, t, ctx,
            edit_cfg=ecfg, edit_state=state, added_cond=added,
            mutable=["intermediates"],
        )
        return out, collect_maps(vs["intermediates"])

    def _edit_text_embeddings(self, guidance_text: str) -> jnp.ndarray:
        """[uncond, uncond_ref, cond_edit] — the deduped 3-stream CFG text
        layout.  The reference runs 4 streams [u_e, u_r, c_e, c_r]
        (forward_sampling, model.py:536-564), but its two reference streams
        receive identical latents AND identical ("") prompts, so c_r == u_r
        by construction; one shared reference stream cuts sampling UNet
        compute by 25% with unchanged outputs (tests/test_stream_dedup.py)."""
        embs = self.encode_text(["", guidance_text])
        return jnp.stack([embs[0], embs[0], embs[1]])

    def _batch_text_embeddings(self, texts: Sequence[str]):
        """Per-case conditioning rows for the batched lanes.  Hook point:
        the SDXL pipeline returns a (context [B, 77, 2048],
        added_cond [B, A]) tuple; consumers stack leaf-wise."""
        return self.encode_text(texts)


# ---------------------------------------------------------------------------
# Batched multi-case editing
# ---------------------------------------------------------------------------


def edit_case_fn(
    unet_plain,
    unet_edit,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    *,
    num_actual: int,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
):
    """One case's full edit compute (invert both streams -> regenerate),
    as a pure function suitable for `jax.vmap` over a case axis.

    The reference harness is explicitly limited to batch size 1
    ("we do not support batchsize > 1", evaluation/FreeFine/
    freefine_batch_infer_2d.py:170) because its attention controller holds
    per-case mutable state; here the state is data, so cases batch freely —
    the key throughput unlock on large chips.
    """

    def fn(params, lat2, text2, text_s, state, cg, gates, cfg_mask, var_mask, rng):
        traj = ddim_invert_loop(unet_plain, params, schedule, lat2, text2,
                                num_actual)
        return sample_edit_loop(
            unet_edit, params, schedule, ecfg, traj, text_s, state, cg, gates,
            cfg_mask, var_mask, rng,
            start_step=start_step, guidance_scale=guidance_scale, eta=eta,
            local_text_edit=local_text_edit,
            local_perturbation=local_perturbation,
        )

    return fn


def edit_shared_fn(
    unet_plain,
    unet_edit,
    unet_capture,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    *,
    num_actual: int,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
):
    """Full shared-source edit compute for B cases of ONE source image:
    invert the B coarse latents as one plain batch, invert the shared
    reference latent ONCE, then regenerate with `sample_edit_loop_shared`.

    Per-edit UNet cost vs the per-case lane (`edit_case_fn`): inversion
    1 + 1/B streams instead of 2, regeneration 2 + 1/B instead of 3 —
    30% less at B = 4 with identical outputs (the reference stream is the
    same computation for every case of one source)."""

    def fn(params, lat_coarse, lat_ref, text_u, text_pair, states, cg,
           gates, cfg_masks, var_masks, rngs):
        b = lat_coarse.shape[0]
        tmap = jax.tree_util.tree_map
        # leaf-wise so SDXL's (context, added_cond) conditioning works too
        text_b = tmap(
            lambda a: jnp.broadcast_to(a[None], (b,) + a.shape), text_u
        )
        text_u1 = tmap(lambda a: a[None], text_u)
        traj_c = ddim_invert_loop(
            unet_plain, params, schedule, lat_coarse, text_b, num_actual
        )
        traj_r = ddim_invert_loop(
            unet_plain, params, schedule, lat_ref[None], text_u1,
            num_actual,
        )
        return sample_edit_loop_shared(
            unet_edit, unet_capture, params, schedule, ecfg,
            traj_r[:, 0], traj_c[-1], text_pair, text_u1, states,
            cg, gates, cfg_masks, var_masks, rngs,
            start_step=start_step, guidance_scale=guidance_scale, eta=eta,
            local_text_edit=local_text_edit,
            local_perturbation=local_perturbation,
        )

    return fn


def bggen_shared_fn(
    unet_plain,
    unet_edit,
    unet_capture,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    *,
    num_actual: int,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
):
    """Full shared-source background generation for B removal cases of ONE
    source image: invert the source ONCE (it is both the init and the
    reference of every case), then `sample_bggen_loop_shared`.

    Per-edit UNet cost vs the per-case batched lane (`bggen_case_fn`):
    inversion 1/B streams instead of 1, regeneration 2 + 1/B instead of 3."""

    def fn(params, lat_ref, text_u, text_pair, states, cg, gates,
           cfg_masks, var_masks, rngs):
        tmap = jax.tree_util.tree_map
        text_u1 = tmap(lambda a: a[None], text_u)
        traj_r = ddim_invert_loop(
            unet_plain, params, schedule, lat_ref[None], text_u1, num_actual
        )
        return sample_bggen_loop_shared(
            unet_edit, unet_capture, params, schedule, ecfg,
            traj_r[:, 0], text_pair, text_u1, states,
            cg, gates, cfg_masks, var_masks, rngs,
            start_step=start_step, guidance_scale=guidance_scale, eta=eta,
            local_text_edit=local_text_edit,
            local_perturbation=local_perturbation,
        )

    return fn


def _stack_states(states):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _stack_masks_np(masks, h: int, w: int) -> np.ndarray:
    """Host-side: raw masks (any dtype, [H,W] or [H,W,C]) -> one [N, h, w]
    float32 stack.  Resizing (nearest, matching `masks.prepare_mask`) only
    happens when a case isn't already at the pipeline resolution, so the
    batched prep below sees uniform shapes."""
    out = []
    for m in masks:
        a = np.asarray(m)
        if a.ndim == 3:
            a = a[..., 0]
        a = a.astype(np.float32)
        if a.shape != (h, w):
            a = np.asarray(nearest_resize(jnp.asarray(a), h, w))
        out.append(a)
    return np.stack(out)


def _case_rngs(seed, n: int) -> jnp.ndarray:
    """Per-case RNG keys for the batched lanes.

    A sequence of seeds gives case i exactly `jax.random.key(seed[i])` —
    the key the single-case pipeline uses — so a case's output is
    bit-identical whether it runs alone or inside any batch (and across
    resume boundaries, where group composition changes).  A scalar keeps
    the legacy split-from-one-key behaviour."""
    if isinstance(seed, (list, tuple, np.ndarray)):
        assert len(seed) == n, (len(seed), n)
        return jnp.stack([jax.random.key(int(s)) for s in seed])
    return jax.random.split(jax.random.key(seed), n)


class _NullTimer:
    """StageTimer-compatible no-op (profiling off by default)."""

    @contextlib.contextmanager
    def stage(self, name):
        yield


class BatchedFreeFine:
    """Multi-case batched editing on top of a FreeFine pipeline.

    Processes N independent GeoBench-style cases per device step: the UNet
    batch becomes N*4 streams, amortising launch overheads and filling the
    MXU at small resolutions.  All host->device prep is batched too — ONE
    VAE-encode call, ONE text-encode call and ONE vmapped mask-prep call per
    batch (the reference harness is locked to batch 1,
    freefine_batch_infer_2d.py:170).

    Pass a `freefine_tpu.utils.profiling.StageTimer` as `timer=` to any
    method to get per-stage wall-clock records (prep/encode/edit/decode).
    """

    def __init__(self, pipe: "FreeFine"):
        self.pipe = pipe

    def _put_cases(self, *arrays):
        """Commit case-stacked args onto the serving mesh's 'data' axis
        (no-op without use_mesh)."""
        s = self.pipe.serving
        if s is None:
            return arrays if len(arrays) > 1 else arrays[0]
        return s.put_cases(*arrays)

    # -- shared prep -----------------------------------------------------

    def _encode_images(self, images: np.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] uint8 -> [B, lh, lw, 4] in one device call."""
        return self.pipe.image_to_latent(images)

    def _uncond_and_conds(self, texts):
        """ONE text-encode for [uncond] + per-case prompts.

        Returns (uncond, conds) PYTREES: plain [77, D]/[B, 77, D] arrays for
        the SD/DiT pipelines, (context, added_cond) tuples for SDXL (via the
        `_batch_text_embeddings` hook) — every consumer stacks with
        tree_map, so the batched lanes work for any conditioning layout."""
        embs = self.pipe._batch_text_embeddings([""] + list(texts))
        uncond = jax.tree_util.tree_map(lambda a: a[0], embs)
        conds = jax.tree_util.tree_map(lambda a: a[1:], embs)
        return uncond, conds

    def _edit_mask_states(self, cases, use_auto_draw, reduce_inp_artifacts):
        """ONE vmapped mask-prep call for an edit-case batch: per-case
        EditState pyramids + completion-CFG and local-variance masks."""
        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        n = len(cases)
        tgt = _stack_masks_np(
            [c["target_mask"] for c in cases], cfg.height, cfg.width)
        orim = _stack_masks_np(
            [c["ori_mask"] for c in cases], cfg.height, cfg.width)
        draws = [c.get("draw_mask") for c in cases]
        has_draw = any(d is not None for d in draws)
        if has_draw:
            assert all(d is not None for d in draws), (
                "cannot batch cases with and without draw_mask together"
            )
            draw = _stack_masks_np(draws, cfg.height, cfg.width)
        else:
            draw = np.zeros((n, cfg.height, cfg.width), np.float32)
        cons = _stack_masks_np(
            [c.get("cons_area",
                   np.zeros((cfg.height, cfg.width), np.float32))
             for c in cases],
            cfg.height, cfg.width)

        pkey = ("edit_batch_prep", n, use_auto_draw,
                reduce_inp_artifacts, has_draw)
        if pkey not in pipe._jit_cache:
            def prep(tgt1, ori1, draw1, cons1):
                em = mask_ops.prepare_various_mask(
                    tgt1, ori1, draw1 if has_draw else None,
                    cfg.height, cfg.width, lh, lw,
                    use_auto_draw=use_auto_draw, cons_area=cons1,
                    reduce_inp_artifacts=reduce_inp_artifacts,
                )
                st = EditState(
                    fg_retain=build_mask_pyramid(em.fg_retain, lh, lw),
                    fg_ref=build_mask_pyramid(em.fg_ref, lh, lw),
                    local_region=build_mask_pyramid(em.fg_retain, lh, lw),
                )
                return st, em.completion_cfg, em.local_var

            pipe._jit_cache[pkey] = jax.jit(jax.vmap(prep))
        return pipe._jit_cache[pkey](tgt, orim, draw, cons)

    def generation(
        self,
        cases,  # sequence of dicts with ori_img/ori_mask/coarse_input/
                # target_mask/guidance_text (+ optional draw/cons kwargs)
        guidance_scale: float = 7.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 25,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        use_auto_draw: bool = True,
        reduce_inp_artifacts: bool = True,
        end_scale: float = 0.5,
        seed: int = 42,
        timer=None,
    ):
        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        n = len(cases)
        tm = timer if timer is not None else _NullTimer()

        with tm.stage("prep_images"):
            coarse = np.stack([pipe._prep_image(c["coarse_input"]) for c in cases])
            ori = np.stack([pipe._prep_image(c["ori_img"]) for c in cases])
        with tm.stage("vae_encode"):
            lats = self._encode_images(np.concatenate([coarse, ori], axis=0))
            lat2 = jnp.stack([lats[:n], lats[n:]], axis=1)  # [n, 2, lh, lw, 4]
        with tm.stage("text_encode"):
            uncond, conds = self._uncond_and_conds(
                [c["guidance_text"] for c in cases]
            )
            tmap = jax.tree_util.tree_map
            u = tmap(
                lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), uncond
            )
            # [n, 2, 77, D] inversion rows / [n, 3, ...] deduped CFG rows
            # (leaf-wise, so SDXL's (context, added_cond) tuples batch too)
            text2 = tmap(lambda a: jnp.stack([a, a], axis=1), u)
            text3 = tmap(
                lambda ua, ca: jnp.stack([ua, ua, ca], axis=1), u, conds
            )
        with tm.stage("mask_prep"):
            states, cfg_masks, var_masks = self._edit_mask_states(
                cases, use_auto_draw, reduce_inp_artifacts
            )

        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        ecfg = self.pipe._edit_config(
            mode="edit", method=method, local_cfg=local_text_edit
        )
        key = (
            "edit_batch", n, num_step, start_step, ecfg, guidance_scale, eta,
            local_text_edit, local_perturbation,
        )
        if key not in pipe._jit_cache:
            schedule = pipe._schedule(num_step)
            case_fn = edit_case_fn(
                pipe._unet_apply_plain, pipe._make_unet_apply(ecfg),
                schedule, ecfg,
                num_actual=num_step - start_step, start_step=start_step,
                guidance_scale=guidance_scale, eta=eta,
                local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
            )
            pipe._jit_cache[key] = jax.jit(
                jax.vmap(case_fn, in_axes=(None, 0, 0, 0, 0, None, None, 0, 0, 0))
            )
        rngs = _case_rngs(seed, n)
        with tm.stage("edit"):
            lat2, text2, text3, states, cfg_masks, var_masks, rngs = (
                self._put_cases(
                    lat2, text2, text3, states, cfg_masks, var_masks, rngs
                )
            )
            out = pipe._jit_cache[key](
                pipe.params, lat2, text2, text3,
                states, jnp.asarray(cg), jnp.asarray(gates),
                cfg_masks, var_masks, rngs,
            )
            out = jax.block_until_ready(out)
        # decode all edit streams in one VAE batch
        with tm.stage("decode"):
            imgs = pipe.latent_to_image(out[:, 0])
        return [imgs[i] for i in range(n)]

    def generation_shared_source(
        self,
        cases,  # dicts with ori_img/ori_mask/coarse_input/target_mask/
                # guidance_text — ALL sharing the same ori_img
        guidance_scale: float = 7.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 25,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        use_auto_draw: bool = True,
        reduce_inp_artifacts: bool = True,
        end_scale: float = 0.5,
        seed: int = 42,
        timer=None,
    ):
        """`generation` for cases that edit the SAME source image, sharing
        one reference stream across the whole batch (GeoBench groups ~10
        edits per source instance).  The shared reference is inverted once
        and its per-step K/V are captured once and broadcast, cutting
        per-edit UNet cost from 2+3 to (1+1/B)+(2+1/B) stream-passes —
        30% at B = 4.

        Semantics note: the capture pass runs the reference stream with
        vanilla self-attention, i.e. this lane uses the *intent*
        (EditConfig.ref_vanilla) reference-stream semantics — under the
        reference-exact head-parity masks the reference stream's even-head
        self-modulation depends on each case's masks, so an exact shared
        capture is impossible by construction.  Outputs equal `generation`
        run with ref_vanilla=True case by case (tests/test_shared_ref.py);
        the default per-case lane (ref_vanilla=False) differs on the
        reference stream's even heads.  Use `generation` for mixed sources,
        B = 1, or strict reference parity."""
        pipe = self.pipe
        cfg = pipe.config
        n = len(cases)
        tm = timer if timer is not None else _NullTimer()
        assert method_type in ("tca", "mmsa", "mmsa_es"), (
            "shared-source lane supports the tca/mmsa methods (the GeoBench "
            f"protocol); got {method_type}"
        )
        ori0 = np.asarray(cases[0]["ori_img"])
        for c in cases[1:]:
            assert np.array_equal(np.asarray(c["ori_img"]), ori0), (
                "generation_shared_source requires every case to share one "
                "ori_img; use generation() for mixed-source batches"
            )

        with tm.stage("prep_images"):
            coarse = np.stack(
                [pipe._prep_image(c["coarse_input"]) for c in cases])
            ori = pipe._prep_image(ori0)
        with tm.stage("vae_encode"):
            lats = self._encode_images(
                np.concatenate([coarse, ori[None]], axis=0))
            lat_coarse, lat_ref = lats[:n], lats[n]
        with tm.stage("text_encode"):
            uncond, conds = self._uncond_and_conds(
                [c["guidance_text"] for c in cases]
            )
            tmap = jax.tree_util.tree_map
            u = tmap(
                lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), uncond
            )
            # [n, 2, ...] per-case [uncond, cond] rows, leaf-wise (SDXL's
            # (context, added_cond) tuples included)
            text_pair = tmap(
                lambda ua, ca: jnp.stack([ua, ca], axis=1), u, conds
            )
        with tm.stage("mask_prep"):
            states, cfg_masks, var_masks = self._edit_mask_states(
                cases, use_auto_draw, reduce_inp_artifacts
            )

        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        ecfg = self.pipe._edit_config(
            mode="edit", method=method, local_cfg=local_text_edit,
            shared_ref=True, ref_vanilla=True,
        )
        cap_cfg = dataclasses.replace(
            none_config(), store_kv=True,
            tca_scope=ecfg.tca_scope, layer_range=ecfg.layer_range,
        )
        key = (
            "edit_shared", n, num_step, start_step, ecfg, guidance_scale,
            eta, local_text_edit, local_perturbation,
        )
        if key not in pipe._jit_cache:
            schedule = pipe._schedule(num_step)
            fn = edit_shared_fn(
                pipe._unet_apply_plain, pipe._make_unet_apply(ecfg),
                pipe._make_unet_capture(cap_cfg), schedule, ecfg,
                num_actual=num_step - start_step, start_step=start_step,
                guidance_scale=guidance_scale, eta=eta,
                local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
            )
            pipe._jit_cache[key] = jax.jit(fn)
        rngs = _case_rngs(seed, n)
        with tm.stage("edit"):
            lat_coarse, text_pair, states, cfg_masks, var_masks, rngs = (
                self._put_cases(
                    lat_coarse, text_pair, states, cfg_masks, var_masks, rngs
                )
            )
            out = pipe._jit_cache[key](
                pipe.params, lat_coarse, lat_ref, uncond, text_pair,
                states, jnp.asarray(cg), jnp.asarray(gates),
                cfg_masks, var_masks, rngs,
            )
            out = jax.block_until_ready(out)
        with tm.stage("decode"):
            imgs = pipe.latent_to_image(out)
        return [imgs[i] for i in range(n)]

    def background_generation(
        self,
        cases,  # sequence of dicts with ori_img / ori_mask / guidance_text
        guidance_scale: float = 3.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 1,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        end_scale: float = 0.5,
        seed: int = 42,
        timer=None,
    ):
        """Batched object removal: N independent cases per device step."""
        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        n = len(cases)
        tm = timer if timer is not None else _NullTimer()

        with tm.stage("prep_images"):
            ori = np.stack([pipe._prep_image(c["ori_img"]) for c in cases])
        with tm.stage("vae_encode"):
            lat1 = self._encode_images(ori)[:, None]        # [n, 1, lh, lw, 4]
        with tm.stage("text_encode"):
            uncond, conds = self._uncond_and_conds(
                [c["guidance_text"] for c in cases]
            )
            tmap = jax.tree_util.tree_map
            u = tmap(
                lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), uncond
            )
            # leaf-wise (SDXL (context, added_cond) tuples batch too)
            text1 = tmap(lambda a: a[:, None], u)            # [n, 1, ...]
            text3 = tmap(
                lambda ua, ca: jnp.stack([ua, ua, ca], axis=1), u, conds
            )
        with tm.stage("mask_prep"):
            masks = _stack_masks_np(
                [c["ori_mask"] for c in cases], cfg.height, cfg.width)

            pkey = ("bggen_batch_prep", n)
            if pkey not in pipe._jit_cache:
                def prep(m):
                    mask_full, lv = mask_ops.prepare_mask_bggen(
                        m, cfg.height, cfg.width, lh, lw
                    )
                    pyr = build_mask_pyramid(mask_full, lh, lw)
                    return (
                        EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr),
                        lv,
                    )

                pipe._jit_cache[pkey] = jax.jit(jax.vmap(prep))
            states, lvars = pipe._jit_cache[pkey](masks)

        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        ecfg = self.pipe._edit_config(
            mode="bggen", method=method, local_cfg=local_text_edit
        )
        key = (
            "bggen_batch", n, num_step, start_step, ecfg, guidance_scale, eta,
            local_text_edit, local_perturbation,
        )
        if key not in pipe._jit_cache:
            schedule = pipe._schedule(num_step)
            case_fn = bggen_case_fn(
                pipe._unet_apply_plain, pipe._make_unet_apply(ecfg),
                schedule, ecfg,
                num_actual=num_step - start_step, start_step=start_step,
                guidance_scale=guidance_scale, eta=eta,
                local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
            )
            pipe._jit_cache[key] = jax.jit(
                jax.vmap(case_fn, in_axes=(None, 0, 0, 0, 0, None, None, 0, 0, 0))
            )
        rngs = _case_rngs(seed, n)
        with tm.stage("edit"):
            lat1, text1, text3, states, lvars, rngs = self._put_cases(
                lat1, text1, text3, states, lvars, rngs
            )
            out = pipe._jit_cache[key](
                pipe.params, lat1, text1, text3,
                states, jnp.asarray(cg), jnp.asarray(gates),
                lvars, lvars, rngs,
            )
            out = jax.block_until_ready(out)
        with tm.stage("decode"):
            imgs = pipe.latent_to_image(out[:, 0])
        return [imgs[i] for i in range(n)]

    def background_generation_shared_source(
        self,
        cases,  # dicts with ori_img / ori_mask / guidance_text — ALL
                # sharing the same ori_img (one GeoBench source image)
        guidance_scale: float = 3.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 1,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        end_scale: float = 0.5,
        seed: int = 42,
        timer=None,
    ):
        """`background_generation` for removal cases on the SAME source
        image: the source is VAE-encoded and DDIM-inverted ONCE (it is
        both every case's init latent and every case's per-step reference,
        forward_sampling_background_gen model.py:756-760), and the
        reference stream runs once per step as a shared K/V capture.
        Per-case UNet cost drops from 1+3 to (2 + 2/B) stream-passes —
        the removal stage runs num_step-1 denoise steps (start_step=1),
        so this is the heaviest per-case saving of the shared lanes.
        ref_vanilla semantics like `generation_shared_source`."""
        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        n = len(cases)
        tm = timer if timer is not None else _NullTimer()
        assert method_type in ("tca", "mmsa", "mmsa_es"), method_type
        ori0 = np.asarray(cases[0]["ori_img"])
        for c in cases[1:]:
            assert np.array_equal(np.asarray(c["ori_img"]), ori0), (
                "background_generation_shared_source requires every case "
                "to share one ori_img; use background_generation for "
                "mixed-source batches"
            )

        with tm.stage("prep_images"):
            ori = pipe._prep_image(ori0)
        with tm.stage("vae_encode"):
            lat_ref = self._encode_images(ori[None])[0]
        with tm.stage("text_encode"):
            uncond, conds = self._uncond_and_conds(
                [c["guidance_text"] for c in cases]
            )
            tmap = jax.tree_util.tree_map
            u = tmap(
                lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), uncond
            )
            text_pair = tmap(
                lambda ua, ca: jnp.stack([ua, ca], axis=1), u, conds
            )
        with tm.stage("mask_prep"):
            masks = _stack_masks_np(
                [c["ori_mask"] for c in cases], cfg.height, cfg.width)

            pkey = ("bggen_batch_prep", n)
            if pkey not in pipe._jit_cache:
                def prep(m):
                    mask_full, lv = mask_ops.prepare_mask_bggen(
                        m, cfg.height, cfg.width, lh, lw
                    )
                    pyr = build_mask_pyramid(mask_full, lh, lw)
                    return (
                        EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr),
                        lv,
                    )

                pipe._jit_cache[pkey] = jax.jit(jax.vmap(prep))
            states, lvars = pipe._jit_cache[pkey](masks)

        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        ecfg = self.pipe._edit_config(
            mode="bggen", method=method, local_cfg=local_text_edit,
            shared_ref=True, ref_vanilla=True,
        )
        cap_cfg = dataclasses.replace(
            none_config(), store_kv=True,
            tca_scope=ecfg.tca_scope, layer_range=ecfg.layer_range,
        )
        key = (
            "bggen_shared", n, num_step, start_step, ecfg, guidance_scale,
            eta, local_text_edit, local_perturbation,
        )
        if key not in pipe._jit_cache:
            schedule = pipe._schedule(num_step)
            fn = bggen_shared_fn(
                pipe._unet_apply_plain, pipe._make_unet_apply(ecfg),
                pipe._make_unet_capture(cap_cfg), schedule, ecfg,
                num_actual=num_step - start_step, start_step=start_step,
                guidance_scale=guidance_scale, eta=eta,
                local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
            )
            pipe._jit_cache[key] = jax.jit(fn)
        rngs = _case_rngs(seed, n)
        with tm.stage("edit"):
            text_pair, states, lvars, rngs = self._put_cases(
                text_pair, states, lvars, rngs
            )
            out = pipe._jit_cache[key](
                pipe.params, lat_ref, uncond, text_pair,
                states, jnp.asarray(cg), jnp.asarray(gates),
                lvars, lvars, rngs,
            )
            out = jax.block_until_ready(out)
        with tm.stage("decode"):
            imgs = pipe.latent_to_image(out)
        return [imgs[i] for i in range(n)]

    def cross_image_composition(
        self,
        cases,  # dicts with img_lists / ori_mask_lists / tgt_mask_lists /
                # coarse_input / guidance_text_list; all cases must share the
                # source count and prompt count (one compiled graph)
        guidance_scale: float = 7.5,
        eta: float = 1.0,
        end_step: int = 10,
        num_step: int = 50,
        start_step: int = 25,
        method_type: str = "tca",
        local_text_edit: bool = True,
        local_perturbation: bool = True,
        end_scale: float = 0.5,
        dil_completion: bool = False,
        dil_factor: int = 15,
        appearance_transfer: bool = False,
        seed: int = 42,
        timer=None,
    ):
        """Batched N-image composition / appearance transfer."""
        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        n = len(cases)
        ns = len(cases[0]["img_lists"])
        np_prompts = len(cases[0]["guidance_text_list"])
        assert all(len(c["img_lists"]) == ns for c in cases), (
            "all batched compose cases must have the same source count"
        )
        assert all(len(c["guidance_text_list"]) == np_prompts for c in cases)
        tm = timer if timer is not None else _NullTimer()

        with tm.stage("prep_images"):
            imgs = []
            for c in cases:
                imgs.append(pipe._prep_image(c["coarse_input"]))
                imgs.extend(pipe._prep_image(im) for im in c["img_lists"])
            imgs = np.stack(imgs)                            # [n*(ns+1), ...]
        with tm.stage("vae_encode"):
            lats = self._encode_images(imgs).reshape(n, ns + 1, lh, lw, 4)
        with tm.stage("text_encode"):
            flat_prompts = [p for c in cases for p in c["guidance_text_list"]]
            uncond, conds = self._uncond_and_conds(flat_prompts)
            tmap = jax.tree_util.tree_map
            conds = tmap(
                lambda a: a.reshape((n, np_prompts) + a.shape[1:]), conds
            )
            u = tmap(
                lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), uncond
            )

            # Per-stream context: [uncond, prompt_1..prompt_ns (pad ""),
            # uncond] — leaf-wise, so SDXL's (context, added_cond) tuples
            # batch like plain arrays.
            def per_stream(ul, cl):
                parts = [ul[:, None]]
                for i in range(ns):
                    parts.append(
                        cl[:, i][:, None] if i < np_prompts else ul[:, None]
                    )
                parts.append(ul[:, None])
                return jnp.concatenate(parts, axis=1)  # [n, ns+2, ...]

            text_emb = tmap(per_stream, u, conds)
            text_extra = tmap(
                lambda cl, ul: jnp.concatenate([cl, ul[:, None]], axis=1),
                conds, u,
            )                                          # [n, P+1, ...]
        with tm.stage("mask_prep"):
            src_stack = np.stack([
                _stack_masks_np(c["ori_mask_lists"], cfg.height, cfg.width)
                for c in cases
            ])                                                # [n, ns, H, W]
            tgt_stack = np.stack([
                _stack_masks_np(c["tgt_mask_lists"], cfg.height, cfg.width)
                for c in cases
            ])

            pkey = ("compose_batch_prep", n, ns, dil_completion, dil_factor,
                    appearance_transfer)
            if pkey not in pipe._jit_cache:
                def prep(src1, tgt1):
                    cm = mask_ops.prepare_composition_masks(
                        list(src1), list(tgt1), cfg.height, cfg.width, lh, lw,
                        dil_completion=dil_completion, dil_factor=dil_factor,
                        appearance_transfer=appearance_transfer,
                    )
                    st = EditState(
                        src_masks=build_mask_stack_pyramid(cm.src_masks, lh, lw),
                        tgt_masks=build_mask_stack_pyramid(cm.tgt_masks, lh, lw),
                    )
                    return st, cm.completion_cfg, cm.local_var

                pipe._jit_cache[pkey] = jax.jit(jax.vmap(prep))
            states, cfg_masks, var_masks = pipe._jit_cache[pkey](
                src_stack, tgt_stack
            )

        method, cg, gates = _method_and_gates(
            method_type, start_step, end_step, num_step, end_scale
        )
        p = np_prompts + 1
        ecfg = self.pipe._edit_config(
            mode="compose", method=method, local_cfg=local_text_edit,
            num_streams=ns + 2, num_sources=ns, prompt_length=p,
        )
        key = (
            "compose_batch", n, ns, p, num_step, start_step, ecfg,
            guidance_scale, eta, local_text_edit, local_perturbation,
        )
        if key not in pipe._jit_cache:
            schedule = pipe._schedule(num_step)
            case_fn = compose_case_fn(
                pipe._unet_apply_plain, pipe._make_unet_apply(ecfg),
                schedule, ecfg,
                num_actual=num_step - start_step, start_step=start_step,
                guidance_scale=guidance_scale, eta=eta,
                local_text_edit=local_text_edit,
                local_perturbation=local_perturbation,
            )
            pipe._jit_cache[key] = jax.jit(
                jax.vmap(case_fn,
                         in_axes=(None, 0, 0, 0, 0, 0, None, None, 0, 0, 0))
            )
        rngs = _case_rngs(seed, n)
        text_inv = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(
                a[None, None], (n, ns + 1) + a.shape
            ),
            uncond,
        )
        with tm.stage("edit"):
            lats, text_inv, text_emb, states, cfg_masks, var_masks, rngs = (
                self._put_cases(
                    lats, text_inv, text_emb, states, cfg_masks, var_masks,
                    rngs,
                )
            )
            out = pipe._jit_cache[key](
                pipe.params, lats, text_inv, text_emb, text_extra,
                states, jnp.asarray(cg), jnp.asarray(gates),
                cfg_masks, var_masks, rngs,
            )
            out = jax.block_until_ready(out)
        with tm.stage("decode"):
            imgs = pipe.latent_to_image(out[:, 0])
        return [imgs[i] for i in range(n)]


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------


def save_pipeline(pipe: "FreeFine", path: str):
    """Persist converted/initialised params with orbax (the framework's
    checkpoint format; the reference only ever loads HF checkpoints,
    SURVEY.md §5)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), pipe.params, force=True)
    ckptr.wait_until_finished()


def load_pipeline_params(pipe: "FreeFine", path: str) -> dict:
    """Restore params saved by `save_pipeline` (shape/dtype-checked against
    the pipeline's current tree)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), pipe.params)
    pipe.params = restored
    return restored


# ---------------------------------------------------------------------------
# Energy-guided editing (DragonDiffusion-parity)
# ---------------------------------------------------------------------------


def sample_guided_loop(
    unet_apply,      # edit-hooked apply (EditConfig closed over)
    unet_feat,       # plain apply with return_features=True
    params,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    traj: jnp.ndarray,
    text_emb: jnp.ndarray,
    state: EditState,
    cg: jnp.ndarray,
    gates: jnp.ndarray,
    completion_cfg: jnp.ndarray,
    local_var: jnp.ndarray,
    energy_masks: tuple,        # (mask_cur, mask_other, mask_non_overlap)
    rng: jax.Array,
    *,
    start_step: int,
    guidance_scale: float,
    eta: float,
    energy_scale: float,
    energy_until: int,
    feature_indices=(1, 2),
) -> jnp.ndarray:
    """`sample_edit_loop` with DragonDiffusion-style energy guidance added
    to the CFG noise prediction for the first `energy_until` steps
    (reference evaluation/DragonDiffusion/src/models/Sampler.py:74-90:
    noise_pred = noise_pred + guidance while i < 30)."""
    from freefine_tpu.ops.guidance import energy_guidance

    mask_cur, mask_other, mask_no = energy_masks
    target_hw = mask_cur.shape
    k = traj.shape[0] - 1
    nstr = jax.tree_util.tree_leaves(text_emb)[0].shape[0]
    ts = schedule.timesteps[start_step : start_step + k]
    refs = jnp.flip(traj[:k], axis=0)[:, 1:]
    init = traj[-1]
    cfg_mask = completion_cfg[None, :, :, None]
    step_ids = jnp.arange(k)

    def body(carry, xs):
        lat, key = carry
        t, cgt, gt, ref, sid = xs
        lat = lat.at[1:].set(ref)
        st = dataclasses.replace(state, context_guidance=cgt, share_gate=gt)
        model_in = _cfg_model_in(lat, nstr)
        eps = unet_apply(params, model_in, t, text_emb, ecfg, st)
        nu, nc = _cfg_split(eps, nstr)
        noise = nu + guidance_scale * (nc - nu) * cfg_mask

        g = energy_guidance(
            unet_feat, params, lat[:1], ref, t, text_emb[2:3],
            energy_scale=energy_scale, guidance_mask=local_var,
            feature_indices=feature_indices, target_hw=target_hw,
            inv_warp=None, mask_cur=mask_cur, mask_other=mask_other,
            mask_non_overlap=mask_no,
        )
        active = (sid < energy_until).astype(jnp.float32)
        noise = noise.at[:1].add(active * g)

        key, sub = jax.random.split(key)
        lat, _ = ctrl_step(
            schedule, noise, t, lat, local_var, eta, sub, ddim_streams_from=1
        )
        return (lat, key), None

    (lat, _), _ = _scan(body, (init, rng), (ts, cg, gates, refs, step_ids))
    return lat


def _guided_energy_masks(cfg, em):
    """(mask_cur, mask_other, mask_non_overlap) at the guidance feature
    resolution (2x latent)."""
    lh, lw = cfg.latent_height, cfg.latent_width
    hw = (lh * 2, lw * 2)
    resize = lambda m: nearest_resize(m, *hw)
    return (
        resize(em.fg_retain),
        resize(1.0 - jnp.maximum(em.fg_retain, em.fg_ref)),
        resize(em.fg_ref * (1.0 - em.fg_retain)),
    )


def bggen_case_fn(
    unet_plain,
    unet_edit,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    *,
    num_actual: int,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
):
    """One removal case's full compute (invert -> bggen loop), vmappable."""

    def fn(params, lat1, text1, text_s, state, cg, gates, cfg_mask, var_mask, rng):
        traj = ddim_invert_loop(unet_plain, params, schedule, lat1, text1,
                                num_actual)
        return sample_bggen_loop(
            unet_edit, params, schedule, ecfg, traj, text_s, state, cg, gates,
            cfg_mask, var_mask, rng,
            start_step=start_step, guidance_scale=guidance_scale, eta=eta,
            local_text_edit=local_text_edit,
            local_perturbation=local_perturbation,
        )

    return fn


def compose_case_fn(
    unet_plain,
    unet_edit,
    schedule: DDIMSchedule,
    ecfg: EditConfig,
    *,
    num_actual: int,
    start_step: int,
    guidance_scale: float,
    eta: float,
    local_text_edit: bool,
    local_perturbation: bool,
):
    """One composition case's full compute (invert N+1 streams -> compose
    loop), vmappable over a case axis."""

    def fn(params, lats, text_inv, text_emb, text_extra, state, cg, gates,
           cfg_mask, var_mask, rng):
        traj = ddim_invert_loop(unet_plain, params, schedule, lats, text_inv,
                                num_actual)
        return sample_compose_loop(
            unet_edit, params, schedule, ecfg, traj, text_emb, text_extra,
            state, cg, gates, cfg_mask, var_mask, rng,
            start_step=start_step, guidance_scale=guidance_scale, eta=eta,
            local_text_edit=local_text_edit,
            local_perturbation=local_perturbation,
        )

    return fn
