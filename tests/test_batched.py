"""Batched multi-case editing tests."""

import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.pipeline import BatchedFreeFine, FreeFine


@pytest.mark.slow
def test_batched_matches_single():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    batched = BatchedFreeFine(pipe)
    h = w = pipe.config.height
    rng = np.random.default_rng(0)

    def mk_case(seed):
        r = np.random.default_rng(seed)
        img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        coarse = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
        tm = np.zeros((h, w), np.uint8); tm[16:32, 16:32] = 255
        return dict(ori_img=img, ori_mask=m, coarse_input=coarse,
                    target_mask=tm, guidance_text="a cat")

    cases = [mk_case(1), mk_case(2)]
    kw = dict(num_step=6, start_step=3, end_step=1, seed=9)
    outs = batched.generation(cases, **kw)
    assert len(outs) == 2
    assert outs[0].shape == (h, w, 3) and outs[0].dtype == np.uint8
    assert not np.array_equal(outs[0], outs[1])

    # batched case 0 must match the single-case pipeline bit-for-bit up to
    # the per-case RNG (same split order)
    import jax

    single_rng = jax.random.split(jax.random.key(9), 2)
    # single pipeline uses jax.random.key(seed) directly, so compare only
    # structural validity here; numerical equivalence of the batched path is
    # covered by the vmap-free scan tests.
    single = pipe.generation(
        cases[0]["ori_img"], cases[0]["ori_mask"], cases[0]["coarse_input"],
        cases[0]["target_mask"], "a cat",
        num_step=6, start_step=3, end_step=1,
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
        reduce_inp_artifacts=True, seed=9,
    )
    assert single.shape == outs[0].shape


@pytest.mark.slow
def test_batched_cross_image_composition():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    batched = BatchedFreeFine(pipe)
    h = w = pipe.config.height
    r = np.random.default_rng(7)
    cases = []
    for s in range(2):
        app = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        bg = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        coarse = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        m1 = np.zeros((h, w), np.uint8); m1[8:24, 8:24] = 255
        m2 = np.zeros((h, w), np.uint8); m2[24:40, 24:40] = 255
        tm = np.zeros((h, w), np.uint8); tm[16:32, 16:32] = 255
        cases.append(dict(
            img_lists=[app, bg], ori_mask_lists=[m1, m2],
            tgt_mask_lists=[tm], coarse_input=coarse,
            guidance_text_list=["a bird"],
        ))
    from freefine_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    outs = batched.cross_image_composition(
        cases, num_step=5, start_step=2, end_step=1,
        appearance_transfer=True, timer=timer,
    )
    assert len(outs) == 2
    assert outs[0].shape == (h, w, 3) and outs[0].dtype == np.uint8
    assert not np.array_equal(outs[0], outs[1])
    # the profiling hook recorded every stage exactly once
    summary = timer.summary()
    for stage in ("prep_images", "vae_encode", "text_encode",
                  "mask_prep", "edit", "decode"):
        assert summary[stage]["count"] == 1

    # batched case 0 matches the single-case compose pipeline structurally
    single = pipe.cross_image_composition(
        cases[0]["img_lists"], cases[0]["ori_mask_lists"],
        cases[0]["tgt_mask_lists"], cases[0]["coarse_input"],
        cases[0]["guidance_text_list"],
        num_step=5, start_step=2, end_step=1, appearance_transfer=True,
    )
    assert single.shape == outs[0].shape


@pytest.mark.slow
def test_batched_background_generation():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    batched = BatchedFreeFine(pipe)
    h = w = pipe.config.height
    r = np.random.default_rng(3)
    cases = []
    for s in range(2):
        img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
        cases.append(dict(ori_img=img, ori_mask=m, guidance_text="empty"))
    outs = batched.background_generation(cases, num_step=5, start_step=1,
                                         end_step=1)
    assert len(outs) == 2
    assert outs[0].shape == (h, w, 3) and outs[0].dtype == np.uint8
    assert not np.array_equal(outs[0], outs[1])


@pytest.mark.slow
def test_batched_per_case_seeds_composition_invariant():
    """With per-case seeds, a case's output does not depend on WHICH other
    cases share its batch (the property the eval harness relies on for
    reproducible resumes: a group's composition changes across resume
    boundaries but each instance keeps its own seed)."""
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    batched = BatchedFreeFine(pipe)
    h = w = pipe.config.height

    def mk_case(seed):
        r = np.random.default_rng(seed)
        img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        coarse = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
        tm = np.zeros((h, w), np.uint8); tm[16:32, 16:32] = 255
        return dict(ori_img=img, ori_mask=m, coarse_input=coarse,
                    target_mask=tm, guidance_text="a cat")

    c0, c1, c2 = mk_case(1), mk_case(2), mk_case(3)
    kw = dict(num_step=4, start_step=2, end_step=1)
    a = batched.generation([c0, c1], seed=[5, 7], **kw)
    b = batched.generation([c0, c2], seed=[5, 11], **kw)
    np.testing.assert_array_equal(a[0], b[0])
    # same seed twice on identical cases -> identical outputs
    c = batched.generation([c0, c0], seed=[5, 5], **kw)
    np.testing.assert_array_equal(c[0], c[1])
    # scalar seed keeps the legacy split-one-key behaviour (positional rngs)
    d = batched.generation([c0, c1], seed=5, **kw)
    assert not np.array_equal(a[0], d[0])
