"""Mask-engine tests against the reference's cv2/torch semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu import masks as M

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def test_binarize():
    m = jnp.asarray([[0.0, 0.5, 255.0]])
    np.testing.assert_allclose(np.asarray(M.binarize(m)), [[0, 1, 1]])


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
@pytest.mark.parametrize("factor", [3, 15, 30])
def test_dilate_matches_cv2(rng_np, factor):
    mask = (rng_np.random((64, 64)) > 0.9).astype(np.uint8)
    want = cv2.dilate(mask, np.ones((factor, factor), np.uint8), iterations=1)
    got = np.asarray(M.dilate(jnp.asarray(mask, jnp.float32), factor))
    np.testing.assert_allclose(got, want.astype(np.float32))


@pytest.mark.skipif(cv2 is None, reason="cv2 not available")
@pytest.mark.parametrize("factor", [3, 15])
def test_erode_matches_cv2(rng_np, factor):
    mask = (rng_np.random((64, 64)) > 0.3).astype(np.uint8)
    want = cv2.erode(mask, np.ones((factor, factor), np.uint8), iterations=1)
    got = np.asarray(M.erode(jnp.asarray(mask, jnp.float32), factor))
    np.testing.assert_allclose(got, want.astype(np.float32))


def test_prepare_mask_binarizes_255():
    m = np.zeros((32, 32), np.uint8)
    m[4:8, 4:8] = 255
    got = np.asarray(M.prepare_mask(jnp.asarray(m), 32, 32))
    assert got.max() == 1.0 and got.sum() == 16


def test_prepare_various_mask_auto_draw():
    """Branch 3 (use_auto_draw, no artifact reduction, model.py:1481-1496)."""
    h = w = 64
    shifted = np.zeros((h, w), np.float32)
    shifted[20:30, 20:30] = 1
    ori = np.zeros((h, w), np.float32)
    ori[5:15, 5:15] = 1
    cons = np.zeros((h, w), np.float32)

    em = M.prepare_various_mask(
        jnp.asarray(shifted), jnp.asarray(ori), None, h, w, 8, 8,
        use_auto_draw=True, cons_area=jnp.asarray(cons),
    )
    fg = np.asarray(em.fg_retain)
    np.testing.assert_allclose(fg, shifted)
    # complete region: dilated ring around target, excluding target & resp.
    # the (1-(cons-ori)) factor -> value 2 inside old object area of the ring.
    lv = np.asarray(em.local_var)
    assert lv.shape == (8, 8)
    assert lv.max() >= 1.0
    # the ring excludes the target itself
    dil = np.asarray(M.dilate(jnp.asarray(shifted), 15))
    expected = (1 - (cons - ori)) * (1 - shifted) * dil
    want_lv = np.asarray(M.to_latent_res(jnp.asarray(expected), 8, 8))
    np.testing.assert_allclose(lv, want_lv)


def test_prepare_various_mask_draw_branch():
    """Branch 1 (user draw mask, model.py:1436-1452)."""
    h = w = 64
    shifted = np.zeros((h, w), np.float32)
    shifted[20:30, 20:30] = 1
    ori = np.zeros((h, w), np.float32)
    ori[5:15, 5:15] = 1
    draw = np.zeros((h, w), np.float32)
    draw[18:32, 18:32] = 1

    em = M.prepare_various_mask(
        jnp.asarray(shifted), jnp.asarray(ori), jnp.asarray(draw), h, w, 8, 8
    )
    flexible = draw * (1 - shifted)
    np.testing.assert_allclose(np.asarray(em.fg_retain), (flexible + shifted > 0))
    np.testing.assert_allclose(np.asarray(em.fg_ref), ori)
    want = np.asarray(M.to_latent_res(jnp.asarray(flexible), 8, 8))
    np.testing.assert_allclose(np.asarray(em.local_var), want)
    np.testing.assert_allclose(np.asarray(em.completion_cfg), want)


def test_prepare_composition_masks_appearance():
    h = w = 64
    app_mask = np.zeros((h, w), np.float32); app_mask[10:20, 10:20] = 1
    bg_mask = 1 - app_mask
    tgt = np.zeros((h, w), np.float32); tgt[30:40, 30:40] = 1
    cm = M.prepare_composition_masks(
        [jnp.asarray(app_mask), jnp.asarray(bg_mask)], [jnp.asarray(tgt)],
        h, w, 8, 8, appearance_transfer=True,
    )
    assert cm.src_masks.shape == (2, h, w)
    assert cm.tgt_masks.shape == (2, h, w)
    dil = np.asarray(M.dilate(jnp.asarray(tgt), 15))
    np.testing.assert_allclose(np.asarray(cm.tgt_masks[0]), dil)
    np.testing.assert_allclose(np.asarray(cm.tgt_masks[1]), 1 - dil)


def test_prepare_composition_masks_plain():
    h = w = 64
    m1 = np.zeros((h, w), np.float32); m1[10:20, 10:20] = 1
    m2 = np.zeros((h, w), np.float32); m2[40:50, 40:50] = 1
    cm = M.prepare_composition_masks(
        [jnp.asarray(m1), jnp.asarray(m2)], [jnp.asarray(m1), jnp.asarray(m2)],
        h, w, 8, 8,
    )
    assert cm.tgt_masks.shape == (3, h, w)
    np.testing.assert_allclose(np.asarray(cm.tgt_masks[0]), m1)
    # bg row = 1 - dilated union
    dil_union = np.asarray(
        M.binarize(M.dilate(jnp.asarray(m1), 15) + M.dilate(jnp.asarray(m2), 15))
    )
    np.testing.assert_allclose(np.asarray(cm.tgt_masks[2]), 1 - dil_union)
    # cfg mask is zeros when dil_completion=False (model.py:1596-1599)
    np.testing.assert_allclose(np.asarray(cm.completion_cfg), 0.0)


def test_bggen_masks():
    h = w = 64
    m = np.zeros((h, w), np.uint8); m[8:24, 8:24] = 255
    full, lv = M.prepare_mask_bggen(jnp.asarray(m), h, w, 8, 8)
    assert full.shape == (h, w) and lv.shape == (8, 8)
    assert np.asarray(full).max() == 1.0
    np.testing.assert_allclose(np.asarray(lv)[1:3, 1:3], 1.0)


def test_surrounding_mask():
    h = w = 64
    m = np.zeros((h, w), np.float32); m[20:30, 20:30] = 1
    cons = np.zeros((h, w), np.float32)
    out = np.asarray(M.prepare_surrounding_mask(jnp.asarray(m), jnp.asarray(cons)))
    # expanded bbox minus the mask itself
    assert out[20, 18] == 1.0  # jittered left of bbox
    assert out[25, 25] == 0.0  # inside the mask -> excluded
    assert out[0, 0] == 0.0    # far away


def test_surrounding_mask_empty():
    m = jnp.zeros((16, 16))
    out = np.asarray(M.prepare_surrounding_mask(m, jnp.zeros((16, 16))))
    np.testing.assert_allclose(out, 0.0)


def test_constrain_areas_union():
    a = np.zeros((16, 16), np.uint8); a[:4] = 255
    b = np.zeros((16, 16), np.uint8); b[:, :4] = 1
    out = np.asarray(M.get_constrain_areas([jnp.asarray(a), jnp.asarray(b)], 16, 16))
    assert out[0, 0] == 1 and out[10, 2] == 1 and out[10, 10] == 0
