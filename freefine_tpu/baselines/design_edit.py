"""DesignEdit baseline core, TPU-native.

Reimplements the editing method of evaluation/DesignEdit (reference:
src/demo/model.py + utils/sdxl.py) on the freefine_tpu stack — multi-layer
latent editing for object removal, camera panning/zooming, and layer-wise
object moving:

  1. DDIM-invert the (pre-warped, for pan/zoom) image; all latent layers
     start from the inverted x_T (model.py:480-490, prepare_latents
     sdxl.py:438-452).
  2. Denoise an N-stream CFG batch where, per step:
       * the background stream's self-attn keys are computed from hidden
         states zeroed inside the removal hole (`EditConfig(mode="design")`,
         model.py:374-396);
       * proximal regularisation marks edited latents — |cond - uncond|
         above its global 0.75-quantile, dilated — and pulls everything
         OUTSIDE that mask back toward the inversion trajectory with lr
         0.1 for t < 400 (sdxl.py:853-936);
       * layer fusion blends the background stream against the original
         stream outside the hole (first 41 steps) and, once past the blend
         window, composites shifted foreground layers onto the canvas
         stream (model.py:189-203).
  3. Decode the background stream (removal/pan/zoom) or the canvas stream
     (moving).

The whole denoise is one `lax.scan`; the reference's Python step counters
(`mask_time`, `blend_time`, the one-shot move) become 0/1 gate arrays.
The backbone is whatever pipeline is passed in — the reference uses SDXL
(our `SDXLFreeFine`); the tiny/SD-1.5 configs run the identical algorithm.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.edit import EditConfig, EditState, nearest_resize
from freefine_tpu.masks import dilate
from freefine_tpu.schedulers.ddim import DDIMSchedule

# ---------------------------------------------------------------------------
# Host-side pixel warps (utils/utils.py ports)
# ---------------------------------------------------------------------------


def panning(img: np.ndarray, op_list: Sequence[Tuple[str, float]]):
    """Shift the frame, exposing a hole (utils.py:90-136).
    Returns (warped image, hole mask 0/255).

    INTENTIONAL DEVIATION (golden-pinned in
    tests/test_reference_golden_baselines2.py): the reference sums its two
    uint8 axis masks (`mask = w_mask + h_mask`, utils.py:122), which wraps
    at 255+255 — so whenever only ONE axis is panned the hole mask comes
    out all-255 and run_panning inpaints the entire frame.  We return the
    true hole (the intent); the two-axis case is bit-exact either way.
    The warped image matches the reference exactly in all cases."""
    h, w = img.shape[:2]
    out = img.copy()
    w_mask = np.full((h, w), 255, np.uint8)
    h_mask = np.full((h, w), 255, np.uint8)
    used_w = used_h = False
    for op, scale in op_list:
        k = int(scale * (w if op in ("right", "left") else h))
        if k == 0:
            continue
        if op == "right":
            out[:, k:] = out[:, : w - k].copy(); w_mask[:, k:] = 0; used_w = True
        elif op == "left":
            out[:, : w - k] = out[:, k:].copy(); w_mask[:, : w - k] = 0; used_w = True
        elif op == "down":
            out[k:, :] = out[: h - k].copy(); h_mask[k:, :] = 0; used_h = True
        elif op == "up":
            out[: h - k] = out[k:].copy(); h_mask[: h - k] = 0; used_h = True
    mask = np.zeros((h, w), np.uint8)
    if used_w:
        mask |= w_mask
    if used_h:
        mask |= h_mask
    return out, mask


def _area_resize(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """cv2.INTER_AREA downscale (the reference shrinks with it,
    utils.py:145): each destination pixel is the exact fractional-area
    average of the source pixels its footprint covers.  Golden-pinned
    against cv2 in tests/test_reference_golden_baselines2.py."""
    h, w = img.shape[:2]

    def axis_weights(src: int, dst: int) -> np.ndarray:
        scale = src / dst
        wm = np.zeros((dst, src), np.float64)
        for i in range(dst):
            a, b = i * scale, (i + 1) * scale
            for j in range(int(np.floor(a)), min(int(np.ceil(b)), src)):
                wm[i, j] = max(0.0, min(b, j + 1) - max(a, j))
            wm[i] /= scale
        return wm

    wy, wx = axis_weights(h, nh), axis_weights(w, nw)
    flat = img.reshape(h, w, -1).astype(np.float64)
    out = np.einsum("ij,jkc,lk->ilc", wy, flat, wx)
    out = out.reshape((nh, nw) + img.shape[2:])
    if np.issubdtype(img.dtype, np.integer):
        return np.rint(out).clip(0, 255).astype(img.dtype)
    return out.astype(img.dtype)


def zooming(img: np.ndarray, scale: Sequence[float]):
    """Zoom out: shrink the content into the centre (INTER_AREA, like the
    reference), exposing a border hole (utils.py:138-155)."""
    h, w = img.shape[:2]
    nh, nw = int(h * scale[0]), int(w * scale[1])
    resized = _area_resize(img, nh, nw)
    out = img.copy()
    mask = np.full((h, w), 255, np.uint8)
    y0, x0 = (h - nh) // 2, (w - nw) // 2
    out[y0 : y0 + nh, x0 : x0 + nw] = resized
    mask[y0 : y0 + nh, x0 : x0 + nw] = 0
    return out, mask


def attend_mask(mask: Optional[np.ndarray], lh: int, lw: int,
                attend_scale: int = 20) -> jnp.ndarray:
    """Dilate (erode if negative) + nearest-resize to the latent grid
    (utils.attend_mask, utils.py:61-88).  Returns [lh, lw] float 0/1."""
    if mask is None:
        return jnp.zeros((lh, lw), jnp.float32)
    m = (np.asarray(mask) > 127).astype(np.float32)
    mj = jnp.asarray(m)
    if attend_scale > 0:
        mj = dilate(mj, attend_scale)
    elif attend_scale < 0:
        mj = 1.0 - dilate(1.0 - mj, -attend_scale)
    return nearest_resize(mj, lh, lw)


def shift_latent(x: jnp.ndarray, op: str, scale: float) -> jnp.ndarray:
    """Zero-fill latent shift (LayerFusion.mv_op, model.py:130-151).
    x is [1, H, W, C] NHWC; scale is a fraction of the shifted axis."""
    _, h, w, _ = x.shape
    out = jnp.zeros_like(x)
    if op in ("right", "left"):
        k = int(scale * w)
    else:
        k = int(scale * h)
    if k == 0:
        return x
    if op == "right":
        return out.at[:, :, k:, :].set(x[:, :, : w - k, :])
    if op == "left":
        return out.at[:, :, : w - k, :].set(x[:, :, k:, :])
    if op == "down":
        return out.at[:, k:, :, :].set(x[:, : h - k, :, :])
    if op == "up":
        return out.at[:, : h - k, :, :].set(x[:, k:, :, :])
    raise ValueError(op)


def shift_latent_dynamic(
    x: jnp.ndarray, ky: jnp.ndarray, kx: jnp.ndarray
) -> jnp.ndarray:
    """Traced-offset zero-fill shift: equals `shift_latent` composed over
    the down(+)/up(-) and right(+)/left(-) ops with k = ky / kx pixels,
    but with the offsets as runtime values — ONE compile serves every
    (dx, dy) case, which is what makes the case-batched move lane jit-able
    (the reference recompiles nothing because it never jits;
    DesignEdit/models/attention.py mv_op equivalent)."""
    h, w = x.shape[1], x.shape[2]
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    x = jnp.roll(x, ky, axis=1)
    x = jnp.roll(x, kx, axis=2)
    valid_r = jnp.where(ky >= 0, rows >= ky, rows < h + ky)
    valid_c = jnp.where(kx >= 0, cols >= kx, cols < w + kx)
    return x * (valid_r & valid_c).astype(x.dtype)


def _quantile_threshold(delta: jnp.ndarray, q: float) -> jnp.ndarray:
    """Global |delta| quantile (sdxl.py:894-898)."""
    return jnp.quantile(jnp.abs(delta).reshape(-1), q)


def _dilate_latent(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Max-pool dilation of a [N, H, W, C] 0/1 mask (sdxl.py:900-903)."""
    if radius <= 0:
        return mask
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "SAME"
    )


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------


class DesignEdit:
    """Multi-layer latent editing over a FreeFine(/SDXL) pipeline.

    Reference defaults throughout: 50 DDIM steps, CFG 7.5, blend window
    [0, 41], attention mask window (0, 40), proximal quantile 0.75 / lr 0.1
    / recon_t 400 / dilate radius 2 (model.py:454-497, sdxl.py:853-936).
    """

    def __init__(self, pipe):
        self.pipe = pipe
        self._cache = {}

    # -- jitted denoise -------------------------------------------------------

    def _denoise(self, steps: int, n_streams: int, ops_key: Optional[Tuple],
                 guidance_scale: float):
        """ops_key: static (op, scale) list baked into the program, or
        None for the traced-shift variant (`run` then takes an extra
        `shift` [2] int32 (ky, kx) argument — the case-batchable lane)."""
        key = ("denoise", steps, n_streams, ops_key, guidance_scale)
        if key in self._cache:
            return self._cache[key]
        pipe = self.pipe
        schedule = DDIMSchedule.create(num_inference_steps=steps)
        n = n_streams
        ecfg = EditConfig(
            mode="design", method=None, local_cfg=False,
            num_streams=2 * n, kv_source_stream=n + 1,
        )
        dynamic_move = ops_key is None
        op_list = [] if dynamic_move else list(ops_key)

        def run(params, lat, ctx2, remove_mask, attn_keep, refine_keep,
                fg_mask, targets, gates, shift=None):
            """lat [n, lh, lw, 4]; ctx2 conditioning for 2n streams;
            remove_mask [lh, lw] (1 = hole); attn_keep / refine_keep
            {seq: [S]} pyramids (refine_keep additionally excludes the SC
            draw mask, used while the refine gate is on — model.py:
            389-392); fg_mask [lh, lw] (moving); targets
            [steps, n, lh, lw, 4] (trajectory realignment); gates
            [steps, 5] (attn, blend, move, prox, refine)."""
            rm = remove_mask[None, :, :, None]

            def body(x, inp):
                t, tgt, g = inp
                g_attn, g_blend, g_move, g_prox, g_ref = (
                    g[0], g[1], g[2], g[3], g[4]
                )
                keep = {
                    k: jnp.where(g_ref > 0, refine_keep[k], attn_keep[k])
                    for k in attn_keep
                }
                state = EditState(
                    local_region=keep, share_gate=g_attn
                )
                pair = jnp.concatenate([x, x], axis=0)
                ctx, added = pipe._split_text(ctx2)
                eps2 = pipe.unet.apply(
                    params["unet"], pair, t, ctx,
                    edit_cfg=ecfg, edit_state=state, added_cond=added,
                )
                u, c = eps2[:n], eps2[n:]
                delta = (c - u).astype(jnp.float32)
                thr = _quantile_threshold(delta, 0.75)
                mask_edit = _dilate_latent(
                    (jnp.abs(delta) > thr).astype(jnp.float32), 2
                )
                eps = u.astype(jnp.float32) + guidance_scale * delta

                # DDIM step (eta 0)
                a_t = schedule.alpha_at(t)
                a_p = schedule.alpha_prev_strict(t - schedule.step_delta)
                x32 = x.astype(jnp.float32)
                x0 = (x32 - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
                x_new = jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps

                # proximal trajectory realignment (sdxl.py:910-936):
                # force the background stream's hole into the edit mask and
                # free the canvas stream entirely
                me = mask_edit.at[1].set(jnp.clip(mask_edit[1] + rm[0], 0, 1))
                if n > 2:
                    me = me.at[2].set(1.0)
                x_prox = x_new - 0.1 * (x_new - tgt.astype(jnp.float32)) * (
                    1.0 - me
                )
                x_new = jnp.where(g_prox > 0, x_prox, x_new)

                # layer fusion (model.py:189-203)
                blended = x_new.at[1].set(
                    (x_new[1] * rm[0] + x_new[0] * (1.0 - rm[0]))
                )
                x_new = jnp.where(g_blend > 0, blended, x_new)

                if n > 3:
                    fg = x_new[3:4]
                    fgm = fg_mask[None, :, :, None]
                    if dynamic_move:
                        fg = shift_latent_dynamic(fg, shift[0], shift[1])
                        fgm = shift_latent_dynamic(fgm, shift[0], shift[1])
                    else:
                        for op, scale in op_list:
                            if scale:
                                fg = shift_latent(fg, op, scale)
                                fgm = shift_latent(fgm, op, scale)
                    composed = x_new.at[2].set(
                        x_new[1] * (1.0 - fgm[0]) + fg[0] * fgm[0]
                    )
                    x_new = jnp.where(g_move > 0, composed, x_new)

                return x_new.astype(x.dtype), None

            out, _ = jax.lax.scan(
                body, lat, (schedule.timesteps, targets, gates)
            )
            return out

        if dynamic_move:
            # case-batched lane: vmap over a leading case axis (params
            # broadcast, gates shared across cases)
            batched = jax.jit(jax.vmap(
                run, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, None, 0)
            ))
            self._cache[key] = (schedule, batched)
        else:
            self._cache[key] = (schedule, jax.jit(run))
        return self._cache[key]

    # -- shared driver --------------------------------------------------------

    def _edit(self, images: List[np.ndarray], remove_mask_px,
              sample_ref_match: List[int], prompt: str,
              fg_mask_px=None, op_list=(), out_stream: int = 1,
              steps: int = 50, guidance_scale: float = 7.5,
              blend_end: int = 41, mask_end: int = 40,
              recon_t: int = 400, refine_mask_px=None,
              refine_end: int = 25) -> np.ndarray:
        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        n = len(sample_ref_match)

        # invert every distinct source image once
        lats = jnp.concatenate(
            [pipe.image_to_latent(img) for img in images], axis=0
        )
        traj = pipe.invert(lats, steps, 0)       # [steps+1, n_inv, ...]

        remove = attend_mask(remove_mask_px, lh, lw)
        keep_pyr = self._keep_pyramid(remove, lh, lw)
        # SC variant (model.py:352-353, 389-392): while the refine window
        # is open the key mask is the UNION of removal hole and the
        # structure-completion draw mask
        if refine_mask_px is not None:
            refine_union = jnp.clip(
                remove + attend_mask(refine_mask_px, lh, lw), 0.0, 1.0
            )
            refine_pyr = self._keep_pyramid(refine_union, lh, lw)
        else:
            refine_pyr = keep_pyr
        fg_mask = (
            attend_mask(fg_mask_px, lh, lw) if fg_mask_px is not None
            else jnp.zeros((lh, lw), jnp.float32)
        )

        # per-stream x_T and per-step realignment targets
        ref = jnp.asarray(sample_ref_match)
        lat0 = traj[-1][ref]                      # [n, lh, lw, 4]
        # at step i the reverse target is the inversion latent one level
        # cleaner: traj[steps - 1 - i] (x_stars[len-i-2], sdxl.py:931)
        targets = traj[::-1][1:][:, ref]         # [steps, n, ...]

        ts = np.asarray(DDIMSchedule.create(num_inference_steps=steps).timesteps)
        counters = np.arange(1, steps + 1)       # LayerFusion counter
        i = np.arange(steps)
        gates = np.stack([
            ((i > 0) & (i < mask_end)),
            counters <= blend_end,
            counters == blend_end + 1,
            ts < recon_t,
            # refine_time (0, 25]: registered window for the SC union mask
            ((i > 0) & (i <= refine_end)
             & (refine_mask_px is not None)),
        ], axis=1).astype(np.float32)

        ctx_c = pipe._stream_text_embeddings([prompt] * n)
        ctx_u = pipe._inversion_text_embeddings(n)
        ctx2 = self._stack_ctx(ctx_u, ctx_c)

        _, run = self._denoise(
            steps, n, tuple(op_list), float(guidance_scale)
        )
        out = run(pipe.params, lat0, ctx2, remove, keep_pyr, refine_pyr,
                  fg_mask, targets, jnp.asarray(gates))
        return pipe.latent_to_image(out[out_stream : out_stream + 1])[0]

    def _keep_pyramid(self, remove, lh, lw):
        from freefine_tpu.edit import build_mask_pyramid

        return build_mask_pyramid(1.0 - remove, lh, lw)

    @staticmethod
    def _stack_ctx(u, c):
        """[uncond*n ; cond*n] conditioning, tuple-aware (SDXL)."""
        if isinstance(u, tuple):
            return (
                jnp.concatenate([u[0], c[0]], axis=0),
                jnp.concatenate([u[1], c[1]], axis=0),
            )
        return jnp.concatenate([u, c], axis=0)

    # -- public API -----------------------------------------------------------

    def remove(self, image: np.ndarray, mask: np.ndarray, prompt: str = "",
               steps: int = 50,
               refine_mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Object removal (run_remove, model.py:454-497): streams
        [original, inpaint]; decode the inpaint stream.

        `refine_mask` enables the SC (structure-completion) variant
        (model.py:471,482 + register_attention_control:389-392): during
        the first 25 steps the self-attn keys are masked with the UNION of
        the removal hole and this draw mask, so the completed structure is
        synthesised rather than copied."""
        m = (np.asarray(mask) > 0).astype(np.uint8) * 255
        rm = (
            None if refine_mask is None
            else (np.asarray(refine_mask) > 0).astype(np.uint8) * 255
        )
        return self._edit([image], m, [0, 0], prompt, steps=steps,
                          refine_mask_px=rm)

    def pan(self, image: np.ndarray, op_list, prompt: str = "",
            steps: int = 50) -> np.ndarray:
        """Camera panning (run_panning, model.py:542-584): pixel-shift the
        frame, then remove-inpaint the exposed hole."""
        warped, hole = panning(image, op_list)
        return self._edit([warped], hole, [0, 0], prompt, steps=steps)

    def zoom(self, image: np.ndarray, scale, prompt: str = "",
             steps: int = 50) -> np.ndarray:
        """Camera zoom-out (run_zooming, model.py:498-541)."""
        warped, hole = zooming(image, scale)
        return self._edit([warped], hole, [0, 0], prompt, steps=steps)

    def move(self, image: np.ndarray, mask: np.ndarray,
             dx: float = 0.0, dy: float = 0.0, prompt: str = "",
             steps: int = 50) -> np.ndarray:
        """Layer-wise object move (run_moving, model.py:677-724): streams
        [original, inpaint, canvas, fg layer]; the fg layer's latent and
        mask are shifted then composited onto the canvas."""
        ops = []
        if dx:
            ops.append(("right", dx) if dx > 0 else ("left", -dx))
        if dy:
            ops.append(("up", dy) if dy > 0 else ("down", -dy))
        return self._edit(
            [image, image], mask, [0, 0, 0, 1], prompt,
            fg_mask_px=mask, op_list=ops, out_stream=2, steps=steps,
        )

    def move_batch(self, images, masks, moves, prompts,
                   steps: int = 50, guidance_scale: float = 7.5,
                   blend_end: int = 41, mask_end: int = 40,
                   recon_t: int = 400):
        """Case-batched `move`: one inversion scan + one denoise scan over
        a leading case axis (jit(vmap)), with the per-case (dx, dy) as
        traced pixel offsets (`shift_latent_dynamic`) so every case shares
        ONE compiled program — the GeoBench batching the reference's
        per-case loop (DesignEdit/eval_geobench.py) never had.

        images/masks: [B] uint8 arrays; moves: [B] (dx, dy) fractions of
        the image size (positive = right / up, the `move` convention);
        prompts: [B] strings.  Returns [B] uint8 images."""
        import jax as _jax

        pipe = self.pipe
        cfg = pipe.config
        lh, lw = cfg.latent_height, cfg.latent_width
        b = len(images)
        assert len(masks) == len(moves) == len(prompts) == b

        lats = jnp.concatenate(
            [pipe.image_to_latent(img) for img in images], axis=0
        )
        traj = pipe.invert(lats, steps, 0)          # [steps+1, B, ...]

        # per-case stream stacks (streams [orig, inpaint, canvas, fg] all
        # start from the case's own inversion latent, `move`'s
        # sample_ref_match=[0, 0, 0, 1] with both sources identical)
        lat0 = jnp.repeat(traj[-1][:, None], 4, axis=1)     # [B, 4, ...]
        tgt = traj[::-1][1:]                                # [steps, B, ...]
        targets = jnp.repeat(
            jnp.swapaxes(tgt, 0, 1)[:, :, None], 4, axis=2
        )                                                   # [B, steps, 4, ...]

        removes, fgs, keeps, ctxs, shifts = [], [], [], [], []
        for mask, (dx, dy), prompt in zip(masks, moves, prompts):
            m = (np.asarray(mask) > 0).astype(np.uint8) * 255
            remove = attend_mask(m, lh, lw)
            removes.append(remove)
            fgs.append(remove)
            keeps.append(self._keep_pyramid(remove, lh, lw))
            ctx_c = pipe._stream_text_embeddings([prompt] * 4)
            ctx_u = pipe._inversion_text_embeddings(4)
            ctxs.append(self._stack_ctx(ctx_u, ctx_c))
            # exact `move` op semantics: int() truncation on the latent
            # grid, up = negative row shift
            kx = int(dx * lw) if dx > 0 else -int(-dx * lw)
            ky = -int(dy * lh) if dy > 0 else int(-dy * lh)
            shifts.append((ky, kx))

        stack = lambda xs: _jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *xs
        )
        ts = np.asarray(
            DDIMSchedule.create(num_inference_steps=steps).timesteps
        )
        counters = np.arange(1, steps + 1)
        i = np.arange(steps)
        gates = np.stack([
            ((i > 0) & (i < mask_end)),
            counters <= blend_end,
            counters == blend_end + 1,
            ts < recon_t,
            np.zeros((steps,), bool),
        ], axis=1).astype(np.float32)

        _, run = self._denoise(steps, 4, None, float(guidance_scale))
        out = run(
            pipe.params, lat0, stack(ctxs), jnp.stack(removes),
            stack(keeps), stack(keeps), jnp.stack(fgs), targets,
            jnp.asarray(gates), jnp.asarray(shifts, jnp.int32),
        )                                                   # [B, 4, ...]
        return [
            pipe.latent_to_image(out[j, 2:3])[0] for j in range(b)
        ]
