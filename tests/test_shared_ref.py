"""Shared-reference (same-source) batched lane equivalence.

The reference stream of the edit loop is re-pinned to its inverted latent
every step, runs vanilla self-attention, and its stepped output is
discarded (reference model.py:582-586) — so for B cases editing the same
source image it is the same computation B times.  The shared lane
(pipeline.sample_edit_loop_shared) runs it once per step, captures its
TCA-layer K/V (EditConfig.store_kv), and broadcasts them to every case's
2-stream [u_e, c_e] pass (EditConfig.shared_ref).  These tests pin that
the shared lane equals the per-case deduped 3-stream loop, including the
bit-compatible per-case DDPM noise chain.  Both sides run
ref_vanilla=True: the capture pass is a standalone vanilla reference pass,
so the lane implements the intent reference-stream semantics (the
reference-exact head-parity self-modulation is per-case-mask-dependent and
cannot be shared) — see EditConfig.ref_vanilla."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import EditConfig, EditState, build_mask_pyramid, none_config
from freefine_tpu.models.unet import UNet2DCondition
from freefine_tpu.pipeline import (
    _extract_ref_kv,
    _stack_states,
    sample_edit_loop,
    sample_edit_loop_shared,
)
from freefine_tpu.schedulers.ddim import DDIMSchedule

NUM_STEP = 5
START = 2
K = NUM_STEP - START


def _mk_state(lh, lo, hi):
    m = jnp.zeros((lh, lh)).at[lo:hi, lo:hi].set(1.0)
    pyr = build_mask_pyramid(m, lh, lh)
    return EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr), m


@pytest.mark.parametrize("method", ["tca", "mmsa"])
def test_shared_loop_matches_per_case(method):
    cfg = tiny_pipeline_config()
    model = UNet2DCondition(config=cfg.unet)
    lh = cfg.latent_height
    d = cfg.unet.cross_attention_dim
    uncond = jax.random.normal(jax.random.key(11), (77, d))
    conds = jax.random.normal(jax.random.key(12), (2, 77, d))
    params = model.init(
        jax.random.key(0), jnp.zeros((3, lh, lh, 4)), jnp.int32(1),
        jnp.stack([uncond, uncond, conds[0]]),
    )
    schedule = DDIMSchedule.create(num_inference_steps=NUM_STEP)

    st0, m0 = _mk_state(lh, 1, 4)
    st1, m1 = _mk_state(lh, 3, 6)
    ref_traj = jax.random.normal(jax.random.key(2), (K + 1, 1, lh, lh, 4)) * 0.3
    coarse = jax.random.normal(jax.random.key(3), (K + 1, 2, lh, lh, 4)) * 0.3
    cg = jnp.linspace(1.0, 0.3, K)
    gates = jnp.ones((K,))
    keys = jnp.stack([jax.random.key(5), jax.random.key(6)])
    kw = dict(start_step=START, guidance_scale=7.5, eta=1.0,
              local_text_edit=True, local_perturbation=True)

    # --- per-case deduped 3-stream references -----------------------------
    # ref_vanilla: the shared lane's capture pass is a vanilla reference
    # pass, so the per-case comparator must use the intent semantics too
    # (see EditConfig.ref_vanilla / generation_shared_source docstring).
    ecfg3 = EditConfig(mode="edit", method=method, ref_vanilla=True)

    def fn3(p, lat, t, emb, _e, st, extra=None):
        return model.apply(p, lat, t, emb, edit_cfg=ecfg3, edit_state=st)

    want = []
    for b in range(2):
        traj = jnp.concatenate([coarse[:, b : b + 1], ref_traj], axis=1)
        text3 = jnp.stack([uncond, uncond, conds[b]])
        st, m = ((st0, m0), (st1, m1))[b]
        out = sample_edit_loop(
            fn3, params, schedule, ecfg3, traj, text3, st,
            cg, gates, m, m, keys[b], **kw
        )
        want.append(np.asarray(out[0]))

    # --- shared-reference lane ---------------------------------------------
    ecfg_s = EditConfig(mode="edit", method=method, shared_ref=True,
                        ref_vanilla=True)
    cap_cfg = dataclasses.replace(none_config(), store_kv=True)

    def unet_edit(p, lat, t, emb, _e, st, extra=None):
        return model.apply(p, lat, t, emb, edit_cfg=ecfg_s, edit_state=st)

    def unet_capture(p, lat, t, emb):
        _, variables = model.apply(
            p, lat, t, emb, edit_cfg=cap_cfg, edit_state=None,
            mutable=["intermediates"],
        )
        return _extract_ref_kv(variables["intermediates"])

    states = _stack_states([st0, st1])
    text_pair = jnp.stack([
        jnp.stack([uncond, conds[0]]),
        jnp.stack([uncond, conds[1]]),
    ])
    got = sample_edit_loop_shared(
        unet_edit, unet_capture, params, schedule, ecfg_s,
        ref_traj[:, 0], coarse[-1], text_pair, uncond[None], states,
        cg, gates, jnp.stack([m0, m1]), jnp.stack([m0, m1]), keys, **kw
    )
    for b in range(2):
        np.testing.assert_allclose(np.asarray(got[b]), want[b], atol=1e-3)


@pytest.mark.slow
def test_generation_shared_source_matches_generation():
    from freefine_tpu.pipeline import BatchedFreeFine, FreeFine

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    batched = BatchedFreeFine(pipe)
    h = w = pipe.config.height
    r = np.random.default_rng(0)
    ori = r.integers(0, 255, (h, w, 3), dtype=np.uint8)

    def mk_case(seed):
        rr = np.random.default_rng(seed)
        coarse = rr.integers(0, 255, (h, w, 3), dtype=np.uint8)
        m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
        tm = np.zeros((h, w), np.uint8); tm[16:32, 16:32] = 255
        return dict(ori_img=ori, ori_mask=m, coarse_input=coarse,
                    target_mask=tm, guidance_text="a cat")

    cases = [mk_case(1), mk_case(2)]
    kw = dict(num_step=6, start_step=3, end_step=1, seed=9)
    want = batched.generation(cases, **kw)
    got = batched.generation_shared_source(cases, **kw)
    assert len(got) == 2
    for b in range(2):
        assert got[b].shape == (h, w, 3) and got[b].dtype == np.uint8
        diff = np.abs(got[b].astype(np.int32) - want[b].astype(np.int32))
        assert diff.mean() < 1.0 and diff.max() <= 12, (
            b, diff.mean(), diff.max()
        )

    # mixed sources must be rejected
    bad = [mk_case(1), dict(mk_case(2), ori_img=255 - ori)]
    with pytest.raises(AssertionError):
        batched.generation_shared_source(bad, **kw)


@pytest.mark.slow
def test_sdxl_generation_shared_source():
    """The shared-source lane on the SDXL pipeline: tuple conditioning
    broadcasts/stacks leaf-wise, the dual-tower capture pass sows ref K/V,
    and outputs stay close to the per-case batched lane (ref_vanilla
    deviation only on the reference stream's modulated heads)."""
    from freefine_tpu.config import tiny_sdxl_pipeline_config
    from freefine_tpu.pipeline import BatchedFreeFine
    from freefine_tpu.sdxl import SDXLFreeFine

    pipe = SDXLFreeFine(config=tiny_sdxl_pipeline_config(), init_random=True)
    batched = BatchedFreeFine(pipe)
    h = w = pipe.config.height
    r = np.random.default_rng(0)
    ori = r.integers(0, 255, (h, w, 3), dtype=np.uint8)

    def mk_case(seed):
        rr = np.random.default_rng(seed)
        coarse = rr.integers(0, 255, (h, w, 3), dtype=np.uint8)
        m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
        tm = np.zeros((h, w), np.uint8); tm[16:32, 16:32] = 255
        return dict(ori_img=ori, ori_mask=m, coarse_input=coarse,
                    target_mask=tm, guidance_text="a cat")

    cases = [mk_case(1), mk_case(2)]
    kw = dict(num_step=5, start_step=2, end_step=1, seed=9)
    want = batched.generation(cases, **kw)
    got = batched.generation_shared_source(cases, **kw)
    assert len(got) == 2
    for b in range(2):
        assert got[b].shape == (h, w, 3) and got[b].dtype == np.uint8
        diff = np.abs(got[b].astype(np.int32) - want[b].astype(np.int32))
        assert diff.mean() < 2.0 and diff.max() <= 30, (
            b, diff.mean(), diff.max()
        )


def test_background_generation_shared_source_matches():
    """Shared-source removal lane: one inversion + one reference pass per
    step for a whole same-source batch; close to the per-case batched lane
    (ref_vanilla deviation on modulated heads only), mixed sources
    rejected."""
    from freefine_tpu.pipeline import BatchedFreeFine, FreeFine

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    batched = BatchedFreeFine(pipe)
    h = w = pipe.config.height
    r = np.random.default_rng(0)
    ori = r.integers(0, 255, (h, w, 3), dtype=np.uint8)

    def mk_case(y0):
        m = np.zeros((h, w), np.uint8); m[y0:y0 + 16, 8:24] = 255
        return dict(ori_img=ori, ori_mask=m, guidance_text="empty scene")

    cases = [mk_case(4), mk_case(20)]
    kw = dict(num_step=5, start_step=1, end_step=1, seed=9)
    want = batched.background_generation(cases, **kw)
    got = batched.background_generation_shared_source(cases, **kw)
    assert len(got) == 2
    for b in range(2):
        assert got[b].shape == (h, w, 3) and got[b].dtype == np.uint8
        diff = np.abs(got[b].astype(np.int32) - want[b].astype(np.int32))
        assert diff.mean() < 2.0 and diff.max() <= 40, (
            b, diff.mean(), diff.max()
        )
    # different masks must still give different backgrounds
    assert not np.array_equal(got[0], got[1])

    bad = [mk_case(4), dict(mk_case(20), ori_img=255 - ori)]
    with pytest.raises(AssertionError):
        batched.background_generation_shared_source(bad, **kw)
