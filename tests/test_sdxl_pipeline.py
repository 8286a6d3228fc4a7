"""SDXL pipeline wiring tests (tiny config, CPU).

The reference names the SDXL backbone swap as its scaling TODO (README:77);
conditioning protocol per evaluation/DesignEdit/utils/sdxl.py.
"""

import numpy as np
import pytest

from freefine_tpu.config import tiny_sdxl_pipeline_config
from freefine_tpu.sdxl import SDXLFreeFine


@pytest.fixture(scope="module")
def sdxl_pipe():
    return SDXLFreeFine(config=tiny_sdxl_pipeline_config(), init_random=True)


def test_dual_encoder_shapes(sdxl_pipe):
    cfg = sdxl_pipe.config
    ctx, pooled = sdxl_pipe._encode_dual(["a cat", ""])
    assert ctx.shape == (2, 77, cfg.unet.cross_attention_dim)
    assert pooled.shape == (2, cfg.text2.projection_dim)
    added = sdxl_pipe._added_cond(pooled)
    assert added.shape == (2, cfg.unet.addition_embed_dim)
    # encode_text keeps the base-class contract (context only)
    assert sdxl_pipe.encode_text(["x"]).shape == (1, 77, cfg.unet.cross_attention_dim)


def test_openclip_padding_rewrite(sdxl_pipe):
    ids = np.asarray(sdxl_pipe.tokenizer.batch_encode(["a cat on a mat"]))
    ids2, eot = sdxl_pipe._openclip_ids(ids)
    e = int(eot[0])
    assert ids[0, e] == sdxl_pipe.tokenizer.eos
    assert (ids2[0, e + 1:] == 0).all()          # OpenCLIP zero padding
    assert (ids2[0, : e + 1] == ids[0, : e + 1]).all()


@pytest.mark.slow
def test_sdxl_generation_e2e(sdxl_pipe):
    h = w = sdxl_pipe.config.height
    r = np.random.default_rng(0)
    img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
    coarse = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
    m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
    tm = np.zeros((h, w), np.uint8); tm[16:32, 16:32] = 255
    out = sdxl_pipe.generation(
        img, m, coarse, tm, "a cat",
        num_step=6, start_step=3, end_step=1,
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
        reduce_inp_artifacts=True,
    )
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()


@pytest.mark.slow
def test_sdxl_background_generation_e2e(sdxl_pipe):
    h = w = sdxl_pipe.config.height
    r = np.random.default_rng(1)
    img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
    m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
    out = sdxl_pipe.background_generation(
        img, m, "empty scene", num_step=5, start_step=1, end_step=2
    )
    assert out.shape == (h, w, 3) and out.dtype == np.uint8


@pytest.mark.slow
def test_sdxl_composition_e2e(sdxl_pipe):
    h = w = sdxl_pipe.config.height
    r = np.random.default_rng(2)
    app = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
    bg = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
    coarse = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
    m1 = np.zeros((h, w), np.uint8); m1[8:24, 8:24] = 255
    m2 = np.zeros((h, w), np.uint8); m2[24:40, 24:40] = 255
    tm = np.zeros((h, w), np.uint8); tm[16:32, 16:32] = 255
    out = sdxl_pipe.cross_image_composition(
        [app, bg], [m1, m2], [tm], coarse, ["a bird"],
        num_step=5, start_step=2, end_step=1, appearance_transfer=True,
    )
    assert out.shape == (h, w, 3) and out.dtype == np.uint8


@pytest.mark.slow
def test_sdxl_batched_generation_matches_per_case(sdxl_pipe):
    """BatchedFreeFine.generation on the SDXL pipeline: the dual-tower
    (context, added_cond) tuple conditioning batches leaf-wise through
    `_batch_text_embeddings`, and each case's output equals the single-case
    entry point (same per-case RNG derivation)."""
    from freefine_tpu.pipeline import BatchedFreeFine, _case_rngs  # noqa: F401

    h = w = sdxl_pipe.config.height
    r = np.random.default_rng(1)
    cases = []
    for i in range(2):
        m = np.zeros((h, w), np.uint8); m[4 + i*4:20 + i*4, 4:20] = 255
        tm = np.zeros((h, w), np.uint8); tm[12:28, 8 + i*4:24 + i*4] = 255
        cases.append(dict(
            ori_img=r.integers(0, 255, (h, w, 3), dtype=np.uint8),
            ori_mask=m,
            coarse_input=r.integers(0, 255, (h, w, 3), dtype=np.uint8),
            target_mask=tm,
            guidance_text=f"object {i}",
        ))
    kw = dict(num_step=6, start_step=3, end_step=1, use_auto_draw=True,
              reduce_inp_artifacts=True)
    outs = BatchedFreeFine(sdxl_pipe).generation(cases, seed=[5, 7], **kw)
    assert len(outs) == 2
    for i, c in enumerate(cases):
        want = sdxl_pipe.generation(
            c["ori_img"], c["ori_mask"], c["coarse_input"], c["target_mask"],
            c["guidance_text"], seed=[5, 7][i],
            cons_area=np.zeros((h, w), np.uint8), **kw,
        )
        # vmapped vs single-program XLA fusion rounds a handful of pixels
        # across the uint8 boundary (measured 12/12288 off by 1)
        diff = np.abs(outs[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01


@pytest.mark.slow
def test_sdxl_batched_bggen_and_compose(sdxl_pipe):
    """The batched bggen and compose lanes must also accept SDXL's tuple
    conditioning (regression: they crashed on `uncond[None]` after
    _uncond_and_conds went tree-typed)."""
    from freefine_tpu.pipeline import BatchedFreeFine

    batched = BatchedFreeFine(sdxl_pipe)
    h = w = sdxl_pipe.config.height
    r = np.random.default_rng(3)

    bg_cases = []
    for i in range(2):
        m = np.zeros((h, w), np.uint8); m[8 + 4*i:24 + 4*i, 8:24] = 255
        bg_cases.append(dict(
            ori_img=r.integers(0, 255, (h, w, 3), dtype=np.uint8),
            ori_mask=m, guidance_text="empty scene",
        ))
    outs = batched.background_generation(
        bg_cases, num_step=4, start_step=1, end_step=1, seed=[3, 4]
    )
    assert len(outs) == 2 and all(
        o.shape == (h, w, 3) and np.isfinite(o.astype(np.float64)).all()
        for o in outs
    )

    def blob(y0):
        m = np.zeros((h, w), np.uint8); m[y0:y0 + 16, 8:24] = 255
        return m

    co_cases = []
    for i in range(2):
        co_cases.append(dict(
            img_lists=[r.integers(0, 255, (h, w, 3), dtype=np.uint8)
                       for _ in range(2)],
            ori_mask_lists=[blob(4), blob(20)],
            tgt_mask_lists=[blob(8), blob(24)],
            coarse_input=r.integers(0, 255, (h, w, 3), dtype=np.uint8),
            guidance_text_list=["bird"],
        ))
    outs = batched.cross_image_composition(
        co_cases, num_step=4, start_step=2, end_step=1, seed=[5, 6]
    )
    assert len(outs) == 2 and all(
        o.shape == (h, w, 3) and np.isfinite(o.astype(np.float64)).all()
        for o in outs
    )
