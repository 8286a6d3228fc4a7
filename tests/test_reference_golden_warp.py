"""Golden tests against the reference's OWN GeoDiffuser warp code.

Counterpart of tests/test_reference_golden{,_model}.py for the GeoBench-3D
authoring lane: imports ``/root/reference/evaluation/GeoDiffuser/GeoDiffuser/
utils/warp_utils.py`` (reviewed before import — its own code is pure
torch/numpy; the CUDA-only deps it imports at module level are stubbed in
sys.modules below) and pins ``ops/geodiff_warp.py`` against the reference's
executable coordinate chain on identical inputs:

  * ``rotateAxis`` / ``translateMatrixFromVector`` (warp_utils.py:182-232)
    -> the rotation/translation factors of ``geodiff_transform_matrix``;
  * ``pixel2cam`` -> center-conjugation -> ``cam2pixel_vanilla``
    (warp_utils.py:407-446,599-646,728-747, driven through
    ``forward_splatting_pytorch3d_warp(return_coordinates=True)`` with the
    pytorch3d SPLATTER monkeypatched out) -> the ``coords_abs`` /
    correspondence output of ``geodiff_warp``.

What CANNOT be golden-run here (documented deviations, ops/geodiff_warp.py
docstring): the reference's point/mesh rasterisers are pytorch3d+CuPy CUDA
kernels — our softmax-z splat and quad-supersampled mesh footprint are
pinned by the invariant tests in test_author3d.py instead.

Import stubs: ``cupy`` (softsplat's CUDA JIT cache), ``pytorch3d``
(structures/renderer rasterisers).  The stubs only need to satisfy module-
level ``from ... import name`` statements; no stubbed symbol is executed.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from freefine_tpu.ops.geodiff_warp import (
    author_case,
    geodiff_transform_matrix,
    geodiff_warp,
    normalize_depth,
)

REF_WARP = (
    "/root/reference/evaluation/GeoDiffuser/GeoDiffuser/utils/warp_utils.py"
)


@pytest.fixture(scope="module")
def refwarp():
    from golden_stubs import make_module as mod
    from golden_stubs import override

    class _Stub:  # any class the module imports but never runs here
        def __init__(self, *a, **k):
            pass

    # installed unconditionally (other golden fixtures own incompatible
    # stubs of these names); override() restores prior state on teardown.
    gd = mod("GeoDiffuser")
    gu = mod("GeoDiffuser.utils")
    gd.utils = gu
    ss = mod("GeoDiffuser.utils.softsplat")
    gu.softsplat = ss
    p3 = mod("pytorch3d")
    p3.structures = mod(
        "pytorch3d.structures", Pointclouds=_Stub, Meshes=_Stub
    )
    p3.renderer = mod(
        "pytorch3d.renderer",
        compositing=_Stub,
        TexturesVertex=_Stub,
        TexturesUV=_Stub,
        MeshRenderer=_Stub,
        MeshRasterizer=_Stub,
    )
    p3.renderer.points = mod(
        "pytorch3d.renderer.points", rasterize_points=_Stub
    )
    p3.renderer.mesh = mod(
        "pytorch3d.renderer.mesh", rasterize_meshes=_Stub
    )
    restore = override({
        "cupy": mod("cupy", int32=int, float32=float),
        "GeoDiffuser": gd,
        "GeoDiffuser.utils": gu,
        "GeoDiffuser.utils.softsplat": ss,
        "pytorch3d": p3,
        "pytorch3d.structures": p3.structures,
        "pytorch3d.renderer": p3.renderer,
        "pytorch3d.renderer.points": p3.renderer.points,
        "pytorch3d.renderer.mesh": p3.renderer.mesh,
        "pytorch3d.renderer.mesh.rasterizer": mod(
            "pytorch3d.renderer.mesh.rasterizer", Fragments=_Stub),
    })

    spec = importlib.util.spec_from_file_location("ref_warp", REF_WARP)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    # the rasteriser is a CUDA path we never take: coordinate tests only
    m.SPLATTER = lambda coords, feats: torch.zeros_like(feats)
    yield m
    restore()
    sys.modules.pop("ref_warp", None)


# -- transform factors ------------------------------------------------------


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("deg", [-37.0, 0.0, 12.5, 90.0])
def test_rotate_axis_golden(refwarp, axis, deg):
    """Our rotation factors == warp_utils.rotateAxis for every axis."""
    ours = geodiff_transform_matrix(
        [0, 0, 0] + [deg if a == axis else 0.0 for a in range(3)] + [1, 1, 1]
    )
    theirs = refwarp.rotateAxis(deg, axis).double().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_translate_golden(refwarp):
    """Translation factor == translateMatrixFromVector(t / LENGTH)."""
    t = np.array([34.0, -80.0, 12.0], np.float32)
    ours = geodiff_transform_matrix(list(t) + [0, 0, 0, 1, 1, 1], length=512)
    theirs = refwarp.translateMatrixFromVector(
        torch.tensor(t / 512.0)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_full_matrix_composition_golden(refwarp):
    """T @ S @ Rx @ Ry @ Rz with the reference's own factor matrices
    (composition order: ui_utils2.get_transformed_mask:709-735)."""
    ep = [20.0, -15.0, 5.0, 10.0, -25.0, 40.0, 1.2, 0.8, 1.1]
    ours = geodiff_transform_matrix(ep, length=512)
    T = refwarp.translateMatrixFromVector(
        torch.tensor(np.asarray(ep[:3], np.float64) / 512.0)
    )
    S = torch.diag(torch.tensor([ep[6], ep[7], ep[8], 1.0]).double())
    R = (
        refwarp.rotateAxis(ep[3], 0).double()
        @ refwarp.rotateAxis(ep[4], 1).double()
        @ refwarp.rotateAxis(ep[5], 2).double()
    )
    np.testing.assert_allclose(ours, (T @ S @ R).numpy(), atol=1e-6)


# -- the coordinate chain ---------------------------------------------------


def _reference_coords(refwarp, img, depth01, mask01, mat, focal):
    """tgt_pix_coords from the reference's own chain: pixel2cam ->
    obj-center conjugation -> cam2pixel_vanilla (warp_utils.py:407-446)."""
    h, w = depth01.shape
    K = np.array(
        [[focal, 0, w / 2.0], [0, focal, h / 2.0], [0, 0, 1]], np.float32
    )
    refwarp.pixel_coords = None  # reset the module-level grid cache
    _img, _vld, _dpj, coords = refwarp.forward_splatting_pytorch3d_warp(
        torch.from_numpy(img.transpose(2, 0, 1)[None]).float() / 255.0,
        torch.from_numpy(depth01[None, None]).float(),
        torch.from_numpy(K[None]),
        torch.from_numpy(mat[None]).float(),
        return_coordinates=True,
        obj_mask=torch.from_numpy(mask01[None, None]).float(),
    )
    c = coords[0].numpy()  # [H, W, 3] (x_norm, y_norm, z)
    # de-normalise the align_corners grid to absolute pixels, exactly as
    # the authoring script does (get_3d_transform_correspondence.py:55-69)
    abs_xy = np.stack(
        [(c[..., 0] + 1) / 2 * (w - 1), (c[..., 1] + 1) / 2 * (h - 1)], -1
    )
    return abs_xy


def _case(h=48, w=48, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    raw = rng.uniform(0.2, 1.4, (h, w)).astype(np.float32)
    raw[:4] = 2.0  # a far-plane band that normalises past the 0.95 snap
    depth01, valid = normalize_depth(raw)
    mask01 = np.zeros((h, w), np.float32)
    mask01[12:30, 10:26] = 1.0
    return img, raw, depth01, valid, mask01


@pytest.mark.parametrize(
    "edit_param",
    [
        [40.0, -25.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0],       # translate
        [0.0, 0.0, 0.0, 0.0, 35.0, 0.0, 1.0, 1.0, 1.0],         # rotate y
        [10.0, 5.0, -20.0, 8.0, -12.0, 30.0, 1.3, 1.3, 1.3],    # mixed
    ],
)
def test_coordinate_chain_golden(refwarp, edit_param):
    """geodiff_warp's correspondence output == the reference's own
    pixel2cam -> conjugate -> cam2pixel_vanilla chain, to float32 tol."""
    img, _raw, depth01, valid, mask01 = _case()
    mat = geodiff_transform_matrix(edit_param, length=48)
    ref_xy = _reference_coords(refwarp, img, depth01, mask01 * valid, mat, 55.0)

    import jax.numpy as jnp

    _c, _f, _m, ours = geodiff_warp(
        jnp.asarray(img, jnp.float32),
        jnp.asarray(mask01),
        jnp.asarray(depth01),
        jnp.asarray(valid),
        jnp.zeros((48, 48, 3), jnp.float32),
        jnp.asarray(mat),
        jnp.float32(55.0),
    )
    # rtol covers the clamped-z points whose coords are O(1e4) px
    # off-image: pure f32 roundoff at that magnitude
    np.testing.assert_allclose(np.asarray(ours), ref_xy, atol=2e-3, rtol=2e-4)


def test_author_case_correspondence_golden(refwarp):
    """The end-user authoring entry (author_case) emits the reference
    chain's absolute-pixel correspondence at GeoBench focal 550."""
    img, raw, depth01, valid, mask01 = _case(seed=3)
    ep = [-30.0, 18.0, 6.0, 0.0, 20.0, -10.0, 1.1, 1.1, 1.1]
    mat = geodiff_transform_matrix(ep, length=48)
    ref_xy = _reference_coords(
        refwarp, img, depth01, mask01 * valid, mat, 550.0
    )
    bg = np.zeros_like(img)
    _c, _f, _m, _md, coords = author_case(
        img, (mask01 * 255).astype(np.uint8), raw, bg, ep, focal_length=550.0
    )
    np.testing.assert_allclose(coords, ref_xy, atol=2e-3)
