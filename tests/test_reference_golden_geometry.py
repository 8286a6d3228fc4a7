"""Golden test: ops/geometry.re_edit_2d vs the reference's OWN
`re_edit_2d` (/root/reference/src/utils/vis_utils.py:210-274 — imports
only numpy/PIL/cv2/matplotlib/tqdm, reviewed before import).

Our geometry chain was previously pinned against cv2 directly (our own
reading of the reference's matrix algebra); this compares against the
reference function itself on random scenes: the bbox-centred rotation
matrix with the resize-scale decoupling quirk (tx,ty added to dx,dy
BEFORE the rotation terms, vis_utils.py:241-250), bilinear image warp,
nearest mask warp, and all three composite outputs (final image over the
inpainted background, mask*255, hole visualisation).
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from freefine_tpu.ops import geometry as G

VIS_UTILS = "/root/reference/src/utils/vis_utils.py"


@pytest.fixture(scope="module")
def ref_vis():
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location("ref_vis_utils", VIS_UTILS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scene(rng, h=96, w=120):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    inp = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[30:70, 40:90] = 255
    return img, mask, inp


@pytest.mark.parametrize(
    "edit_param",
    [
        [12.0, -7.0, 0.0, 1.0, 1.0],          # pure move
        [0.0, 0.0, 25.0, 1.0, 1.0],           # pure rotation
        [0.0, 0.0, 0.0, 1.3, 0.8],            # anisotropic scale
        [8.0, 5.0, -15.0, 0.9, 1.2],          # combined
    ],
)
def test_re_edit_2d_golden(ref_vis, edit_param):
    rng = np.random.RandomState(3)
    img, mask, inp = _scene(rng)
    want_final, want_mask, want_hole = ref_vis.re_edit_2d(
        img, (mask > 0), list(edit_param), inp
    )
    got_final, got_mask, got_hole = G.re_edit_2d(
        img, mask, edit_param=list(edit_param), inp_cur=inp
    )
    # masks must be IDENTICAL (nearest warp); warped pixels may differ by
    # at most +-1 uint8 (cv2's fixed-point bilinear vs our float path)
    np.testing.assert_array_equal(got_mask, want_mask)
    for got, want in ((got_final, want_final), (got_hole, want_hole)):
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1
        # un-warped pixels (outside the target mask) are copied verbatim
        outside = ~(want_mask > 0)
        assert (diff[outside] == 0).all()


def test_re_edit_2d_golden_9param(ref_vis):
    """The GeoBench 9-param layout routes (dx,dy,rz,sx,sy) through the
    same affine (freefine_batch_infer_2d.py:26-87)."""
    rng = np.random.RandomState(4)
    img, mask, inp = _scene(rng)
    p9 = [10.0, -4.0, 0.0, 0.0, 0.0, 20.0, 1.1, 0.9, 1.0]
    want = ref_vis.re_edit_2d(img, (mask > 0), [10.0, -4.0, 20.0, 1.1, 0.9], inp)
    got = G.re_edit_2d(img, mask, edit_param=p9, inp_cur=inp)
    np.testing.assert_array_equal(got[1], want[1])
