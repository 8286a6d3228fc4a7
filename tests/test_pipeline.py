"""End-to-end pipeline tests on the tiny config (CPU, random weights).

These are the structural integration tests the reference lacks (SURVEY.md
§4): every public entry point runs invert -> modulated sampling -> decode
and produces finite uint8 images; jit caches are exercised across calls.
"""

import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.pipeline import FreeFine, _method_and_gates


@pytest.fixture(scope="module")
def pipe():
    return FreeFine(config=tiny_pipeline_config(), init_random=True)


@pytest.fixture(scope="module")
def case(pipe):
    cfg = pipe.config
    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    coarse = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    m = np.zeros((h, w), np.uint8)
    m[10:30, 10:30] = 255
    tm = np.zeros((h, w), np.uint8)
    tm[20:40, 20:40] = 255
    return img, m, coarse, tm


def test_generation_runs(pipe, case):
    img, m, coarse, tm = case
    h, w = img.shape[:2]
    out = pipe.generation(
        img, m, coarse, tm, "a cat", num_step=6, start_step=3, end_step=1,
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
    )
    assert out.shape == (h, w, 3) and out.dtype == np.uint8


def test_generation_return_ori_and_determinism(pipe, case):
    img, m, coarse, tm = case
    h, w = img.shape[:2]
    kw = dict(
        num_step=6, start_step=3, end_step=1,
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8), seed=11,
    )
    a, ref = pipe.generation(img, m, coarse, tm, "a cat", return_ori=True, **kw)
    b = pipe.generation(img, m, coarse, tm, "a cat", **kw)
    np.testing.assert_array_equal(a, b)  # same seed -> identical output
    assert ref.shape == a.shape


def test_generation_methods(pipe, case):
    img, m, coarse, tm = case
    h, w = img.shape[:2]
    outs = {}
    for method in ("tca", "mmsa", "mmsa_es", "ssa", "sdsa"):
        outs[method] = pipe.generation(
            img, m, coarse, tm, "a cat", num_step=4, start_step=2, end_step=1,
            method_type=method,
            use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
        )
    assert all(o.shape == (h, w, 3) for o in outs.values())
    # tca vs ssa must differ (different modulation graphs)
    assert not np.array_equal(outs["tca"], outs["ssa"])


def test_background_generation_runs(pipe, case):
    img, m, _, _ = case
    out = pipe.background_generation(
        img, m, "empty scene", num_step=6, start_step=1, end_step=2,
        guidance_scale=3.5,
    )
    assert out.shape == img.shape and out.dtype == np.uint8


def test_composition_runs(pipe, case):
    img, m, coarse, tm = case
    out = pipe.cross_image_composition(
        [img, coarse], [m, tm], [tm], coarse, ["bird"],
        num_step=6, start_step=3, end_step=1, appearance_transfer=True,
    )
    assert out.shape == img.shape and out.dtype == np.uint8


def test_vae_roundtrip_shapes(pipe, case):
    img = case[0]
    lat = pipe.image_to_latent(img)
    cfg = pipe.config
    assert lat.shape == (1, cfg.latent_height, cfg.latent_width, 4)
    back = pipe.latent_to_image(lat)
    assert back.shape == (1, cfg.height, cfg.width, 3)
    assert back.dtype == np.uint8


def test_invert_trajectory_shape(pipe, case):
    lat = pipe.image_to_latent(case[0])
    traj = pipe.invert(lat, num_step=6, start_step=2)
    cfg = pipe.config
    assert traj.shape == (5, 1, cfg.latent_height, cfg.latent_width, 4)
    assert np.isfinite(np.asarray(traj)).all()


def test_method_gates():
    m, cg, g = _method_and_gates("tca", 2, 1, 6, 0.5)
    assert m == "tca" and cg.shape == (4,) and (g == 1).all()
    assert cg[0] > cg[-1] >= 0.0
    m, cg, g = _method_and_gates("mmsa_es", 2, 4, 6, 0.5)
    assert m == "mmsa"
    np.testing.assert_array_equal(g, [1, 1, 0, 0])
    m, cg, g = _method_and_gates("ssa", 0, 1, 4, 0.5)
    assert m == "ssa" and (g == 1).all() and (cg == 0).all()


def test_jit_cache_reuse(pipe, case):
    """A second case with the same static config must not recompile."""
    img, m, coarse, tm = case
    h, w = img.shape[:2]
    n_before = len(pipe._jit_cache)
    pipe.generation(
        img, m, coarse, tm, "a dog", num_step=6, start_step=3, end_step=1,
        use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8), seed=1,
    )
    pipe.generation(
        coarse, tm, img, m, "another prompt", num_step=6, start_step=3,
        end_step=1, use_auto_draw=True, cons_area=np.zeros((h, w), np.uint8),
        seed=2,
    )
    assert len(pipe._jit_cache) == max(n_before, len(pipe._jit_cache))


def test_generation_fused_pipeline_matches(pipe, case, monkeypatch):
    """FREEFINE_FUSED_PIPELINE (invert + edit scan in ONE jitted program,
    donated input latents) must be bit-identical to the two-program path."""
    import freefine_tpu.pipeline as P

    img, m, coarse, tm = case
    h, w = img.shape[:2]
    kw = dict(num_step=6, start_step=3, end_step=1, use_auto_draw=True,
              cons_area=np.zeros((h, w), np.uint8), seed=11)
    want = pipe.generation(img, m, coarse, tm, "a cat", **kw)
    monkeypatch.setattr(P, "_FUSED_PIPELINE", True)
    got = pipe.generation(img, m, coarse, tm, "a cat", **kw)
    np.testing.assert_array_equal(got, want)
