"""DiT backbone: forward contract + drop-in replacement in the edit loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_dit_config
from freefine_tpu.edit import EditConfig, EditState, build_mask_pyramid
from freefine_tpu.models.dit import DiT2DCondition
from freefine_tpu.pipeline import ddim_invert_loop, sample_edit_loop
from freefine_tpu.schedulers.ddim import DDIMSchedule


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_dit_config()
    model = DiT2DCondition(config=cfg)
    s = cfg.sample_size
    sample = jnp.ones((3, s, s, 4), jnp.float32) * 0.1
    ctx = jnp.ones((3, 77, cfg.cross_attention_dim), jnp.float32) * 0.05
    params = model.init(jax.random.key(0), sample, jnp.int32(1), ctx)
    return cfg, model, params, sample, ctx


def test_forward_shape_and_dtype(setup):
    cfg, model, params, sample, ctx = setup
    out = model.apply(params, sample, jnp.int32(17), ctx)
    assert out.shape == sample.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # timestep must modulate the output (AdaLN is live)
    out2 = model.apply(params, sample, jnp.int32(900), ctx)
    assert np.abs(np.asarray(out - out2)).max() > 1e-6


def test_edit_hooks_change_output(setup):
    cfg, model, params, sample, ctx = setup
    s = cfg.sample_size
    mask = jnp.zeros((s, s)).at[2:6, 2:6].set(1.0)
    pyr = build_mask_pyramid(mask, s, s)
    state = EditState(
        fg_retain=pyr, fg_ref=pyr, local_region=pyr,
        context_guidance=jnp.float32(1.0),  # pure reference attention
    )
    ecfg = EditConfig(
        mode="edit", method="tca", layer_range=(1, cfg.depth), num_streams=3
    )
    # distinct streams: TCA swaps the edit stream's K/V for the reference
    # stream's, which is only visible when the streams differ
    sample = jax.random.normal(jax.random.key(3), sample.shape) * 0.1
    plain = model.apply(params, sample, jnp.int32(5), ctx)
    edited = model.apply(
        params, sample, jnp.int32(5), ctx, edit_cfg=ecfg, edit_state=state
    )
    assert edited.shape == plain.shape
    # the edit stream (row 0) must deviate from the vanilla forward
    assert np.abs(np.asarray(edited[0] - plain[0])).max() > 1e-6
    assert np.isfinite(np.asarray(edited)).all()


def test_drop_in_edit_loop(setup):
    """The full FreeFine regeneration scan runs unchanged on the DiT."""
    cfg, model, params, _, _ = setup
    s = cfg.sample_size
    schedule = DDIMSchedule.create(num_inference_steps=8)
    ecfg = EditConfig(
        mode="edit", method="tca", layer_range=(1, cfg.depth), num_streams=3
    )
    mask = jnp.zeros((s, s)).at[2:6, 2:6].set(1.0)
    pyr = build_mask_pyramid(mask, s, s)
    state = EditState(fg_retain=pyr, fg_ref=pyr, local_region=pyr)

    def unet_plain(p, lat, t, emb):
        return model.apply(p, lat, t, emb)

    def unet_edit(p, lat, t, emb, _e, st, extra=None):
        return model.apply(p, lat, t, emb, edit_cfg=ecfg, edit_state=st)

    start_step, num_step = 4, 8
    k = num_step - start_step
    lat2 = jnp.ones((2, s, s, 4), jnp.float32) * 0.1
    text3 = jnp.zeros((3, 77, cfg.cross_attention_dim), jnp.float32)
    traj = ddim_invert_loop(unet_plain, params, schedule, lat2, text3[:2], k)
    out = jax.jit(
        lambda tr: sample_edit_loop(
            unet_edit, params, schedule, ecfg, tr, text3, state,
            jnp.linspace(1.0, 0.2, k), jnp.ones((k,), jnp.float32),
            mask, mask, jax.random.key(1),
            start_step=start_step, guidance_scale=7.5, eta=1.0,
            local_text_edit=True, local_perturbation=True,
        )
    )(traj)
    assert out.shape == (2, s, s, 4)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Pipeline-level backbone swap: FreeFine runs every entry point on the DiT
# ---------------------------------------------------------------------------

from freefine_tpu.config import tiny_dit_pipeline_config
from freefine_tpu.pipeline import FreeFine


@pytest.fixture(scope="module")
def dit_pipe():
    return FreeFine(config=tiny_dit_pipeline_config(), init_random=True)


@pytest.fixture(scope="module")
def dit_case(dit_pipe):
    cfg = dit_pipe.config
    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    coarse = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    m = np.zeros((h, w), np.uint8)
    m[10:30, 10:30] = 255
    tm = np.zeros((h, w), np.uint8)
    tm[20:40, 20:40] = 255
    return img, m, coarse, tm


def test_pipeline_generation_on_dit(dit_pipe, dit_case):
    img, m, coarse, tm = dit_case
    h, w = img.shape[:2]
    out = dit_pipe.generation(
        img, m, coarse, tm, "a cat", num_step=6, start_step=3, end_step=1,
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
    )
    assert out.shape == (h, w, 3) and out.dtype == np.uint8


def test_pipeline_bggen_on_dit(dit_pipe, dit_case):
    img, m, _, _ = dit_case
    out = dit_pipe.background_generation(
        img, m, "empty scene", num_step=6, start_step=1,
    )
    assert out.shape == img.shape and out.dtype == np.uint8


def test_pipeline_compose_on_dit(dit_pipe, dit_case):
    img, m, coarse, tm = dit_case
    out = dit_pipe.cross_image_composition(
        [img], [m], [tm], coarse, ["bird"],
        num_step=6, start_step=3,
    )
    assert out.shape == img.shape and out.dtype == np.uint8


def test_layer_range_scales_with_backbone_depth(dit_pipe):
    """ADVICE r3: the (10, 16) default encodes the UNet's 16-block global
    attention indexing; on a depth-D DiT the entry points must gate the
    same late-layer *fraction* — (round(10/16*D), D)."""
    from freefine_tpu.config import dit_pipeline_config
    from freefine_tpu.edit import DEFAULT_LAYER_RANGE

    d = dit_pipe.config.unet.depth
    lo, hi = DEFAULT_LAYER_RANGE
    assert dit_pipe._layer_range == (round(lo / hi * d), d)
    ecfg = dit_pipe._edit_config(mode="edit", method="tca")
    assert ecfg.layer_range == dit_pipe._layer_range
    # explicit layer_range wins
    ecfg = dit_pipe._edit_config(mode="edit", method="tca", layer_range=(1, 2))
    assert ecfg.layer_range == (1, 2)
    # UNet pipelines keep the reference literal window
    from freefine_tpu.config import tiny_pipeline_config

    up = FreeFine(config=tiny_pipeline_config(), init_random=True)
    assert up._layer_range == DEFAULT_LAYER_RANGE


def test_dit_pipeline_config_square_only():
    from freefine_tpu.config import dit_pipeline_config

    with pytest.raises(ValueError, match="square-only"):
        dit_pipeline_config(512, 768)


def test_guided_generation_rejects_dit(dit_pipe, dit_case):
    img, m, coarse, tm = dit_case
    with pytest.raises(NotImplementedError, match="UNet backbone"):
        dit_pipe.guided_generation(
            ori_img=img, ori_mask=m, coarse_input=coarse, target_mask=tm,
            guidance_text="a cat", num_step=4, start_step=2,
        )


def test_pixart_pipeline_lane_runs():
    """The checkpoint-complete PixArt layout (tiny): T5 caption tower +
    learned-sigma DiT through the full generation entry point."""
    from freefine_tpu.config import tiny_pixart_pipeline_config

    pipe = FreeFine(config=tiny_pixart_pipeline_config(), init_random=True)
    assert pipe._text_is_t5
    cfg = pipe.config
    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    coarse = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    m = np.zeros((h, w), np.uint8); m[10:30, 10:30] = 255
    tm = np.zeros((h, w), np.uint8); tm[20:40, 20:40] = 255
    out = pipe.generation(
        ori_img=img, ori_mask=m, coarse_input=coarse, target_mask=tm,
        guidance_text="a cat", num_step=4, start_step=2, end_step=4,
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
    )
    assert out.shape == (h, w, 3) and np.isfinite(np.asarray(out)).all()
