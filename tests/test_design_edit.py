"""DesignEdit baseline core tests: pixel warps, latent shifts, proximal
masking, the key-input-masked attention mode, and the e2e tiny edits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.baselines.design_edit import (
    DesignEdit,
    _dilate_latent,
    _quantile_threshold,
    attend_mask,
    panning,
    shift_latent,
    zooming,
)
from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import EditConfig, EditState, build_mask_pyramid
from freefine_tpu.pipeline import FreeFine


@pytest.fixture(scope="module")
def pipe():
    return FreeFine(config=tiny_pipeline_config(), init_random=True)


def test_panning_exposes_hole():
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    out, mask = panning(img, [("right", 0.25)])
    # content shifted right by 4; the left 4 columns are the hole
    np.testing.assert_array_equal(out[:, 4:], img[:, :12])
    assert (mask[:, :4] == 255).all() and (mask[:, 4:] == 0).all()


def test_zooming_centers_and_masks_border():
    img = np.full((16, 16, 3), 99, np.uint8)
    out, mask = zooming(img, [0.5, 0.5])
    assert mask[8, 8] == 0 and mask[0, 0] == 255
    assert (mask == 0).sum() == 8 * 8


def test_shift_latent_zero_fill():
    x = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    out = shift_latent(x, "right", 0.5)
    np.testing.assert_array_equal(np.asarray(out[0, :, :2, 0]), 0)
    np.testing.assert_array_equal(
        np.asarray(out[0, :, 2:, 0]), np.asarray(x[0, :, :2, 0])
    )


def test_attend_mask_dilates_and_resizes():
    m = np.zeros((32, 32), np.uint8)
    m[10:14, 10:14] = 255
    out = attend_mask(m, 8, 8, attend_scale=4)
    assert out.shape == (8, 8)
    assert float(out.sum()) > 0


def test_quantile_and_dilate():
    d = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 4)))
    thr = float(_quantile_threshold(d, 0.75))
    frac = float((jnp.abs(d) > thr).mean())
    assert abs(frac - 0.25) < 0.05
    m = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(1.0)
    dm = _dilate_latent(m, 1)
    assert float(dm.sum()) == 9.0


def test_design_mode_masks_bg_keys(pipe):
    """The design-mode UNet output must differ in the masked stream when the
    hole mask changes, and be gate-off identical when share_gate = 0."""
    cfg = pipe.config
    lh, lw = cfg.latent_height, cfg.latent_width
    ecfg = EditConfig(mode="design", method=None, local_cfg=False,
                      num_streams=4, kv_source_stream=3)
    lat = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, lh, lw, 4)), jnp.float32
    )
    ctx = jnp.zeros((4, 77, cfg.unet.cross_attention_dim), jnp.float32)
    hole = jnp.zeros((lh, lw)).at[2:6, 2:6].set(1.0)
    keep = build_mask_pyramid(1.0 - hole, lh, lw)

    on = EditState(local_region=keep, share_gate=jnp.float32(1.0))
    off = EditState(local_region=keep, share_gate=jnp.float32(0.0))
    out_on = pipe.unet.apply(pipe.params["unet"], lat, jnp.int32(5), ctx,
                             edit_cfg=ecfg, edit_state=on)
    out_off = pipe.unet.apply(pipe.params["unet"], lat, jnp.int32(5), ctx,
                              edit_cfg=ecfg, edit_state=off)
    out_plain = pipe.unet.apply(pipe.params["unet"], lat, jnp.int32(5), ctx)
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_plain), atol=1e-5
    )
    assert not np.allclose(np.asarray(out_on[3]), np.asarray(out_plain[3]),
                           atol=1e-5)
    # unmasked streams unaffected
    np.testing.assert_allclose(
        np.asarray(out_on[0]), np.asarray(out_plain[0]), atol=1e-5
    )


@pytest.mark.slow
def test_design_edit_remove_and_pan_tiny(pipe):
    de = DesignEdit(pipe)
    h = w = pipe.config.height
    img = np.random.default_rng(2).integers(0, 255, (h, w, 3), dtype=np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[16:32, 16:32] = 255

    out = de.remove(img, mask, prompt="a photo", steps=6)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()

    out2 = de.pan(img, [("right", 0.25)], prompt="a photo", steps=6)
    assert out2.shape == (h, w, 3)


@pytest.mark.slow
def test_design_edit_move_tiny(pipe):
    de = DesignEdit(pipe)
    h = w = pipe.config.height
    img = np.random.default_rng(3).integers(0, 255, (h, w, 3), dtype=np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[16:32, 16:32] = 255
    out = de.move(img, mask, dx=0.25, prompt="a photo", steps=6)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()


@pytest.mark.slow
def test_design_edit_sc_refine_mask_tiny(pipe):
    """SC variant: a refine draw mask changes the result (the key mask is
    the removal+refine union in the refine window) and stays finite."""
    de = DesignEdit(pipe)
    h = w = pipe.config.height
    img = np.random.default_rng(5).integers(0, 255, (h, w, 3), dtype=np.uint8)
    mask = np.zeros((h, w), np.uint8); mask[16:32, 16:32] = 255
    refine = np.zeros((h, w), np.uint8); refine[32:48, 16:32] = 255

    out_sc = de.remove(img, mask, prompt="a photo", steps=6,
                       refine_mask=refine)
    out_plain = de.remove(img, mask, prompt="a photo", steps=6)
    assert out_sc.shape == (h, w, 3) and out_sc.dtype == np.uint8
    assert np.isfinite(out_sc.astype(np.float64)).all()
    assert np.abs(out_sc.astype(int) - out_plain.astype(int)).max() > 0


def test_shift_latent_dynamic_matches_static():
    """shift_latent_dynamic(ky, kx) == shift_latent over the composed
    static ops for every sign combination."""
    from freefine_tpu.baselines.design_edit import shift_latent_dynamic

    x = jnp.arange(1 * 6 * 5 * 2, dtype=jnp.float32).reshape(1, 6, 5, 2) + 1
    for ky, ops_y in ((2, [("down", 2 / 6)]), (-2, [("up", 2 / 6)]), (0, [])):
        for kx, ops_x in ((1, [("right", 1 / 5)]), (-3, [("left", 3 / 5)]),
                          (0, [])):
            ref = x
            for op, s in ops_y + ops_x:
                ref = shift_latent(ref, op, s)
            out = shift_latent_dynamic(
                x, jnp.int32(ky), jnp.int32(kx)
            )
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_design_edit_move_batch_matches_single(pipe):
    """move_batch == per-case move (same semantics, one compiled program
    for every (dx, dy))."""
    de = DesignEdit(pipe)
    h = w = pipe.config.height
    rng = np.random.default_rng(5)
    imgs, masks, moves, prompts = [], [], [], []
    for i, (dx, dy) in enumerate([(0.25, 0.0), (-0.125, 0.25)]):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[12 + i * 4 : 28 + i * 4, 16:32] = 255
        imgs.append(img)
        masks.append(mask)
        moves.append((dx, dy))
        prompts.append(f"a photo {i}")
    outs = de.move_batch(imgs, masks, moves, prompts, steps=6)
    for img, mask, (dx, dy), prompt, out_b in zip(
        imgs, masks, moves, prompts, outs
    ):
        single = de.move(img, mask, dx=dx, dy=dy, prompt=prompt, steps=6)
        np.testing.assert_allclose(
            out_b.astype(np.int16), single.astype(np.int16), atol=1
        )
