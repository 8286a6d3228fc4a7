"""Metric-math tests: Fréchet distance, polynomial MMD, WRAP_E, BGC/SUBC."""

import numpy as np
import pytest

from freefine_tpu.metrics.common import (
    fid_from_features,
    frechet_distance,
    gaussian_stats,
    polynomial_mmd,
)
from freefine_tpu.metrics.consistency import (
    background_consistency_single,
    subject_consistency_single,
)
from freefine_tpu.metrics.wrap_error import wrap_error_single


def test_frechet_identical_is_zero(rng_np):
    f = rng_np.normal(size=(500, 16))
    mu, sig = gaussian_stats(f)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-6


def test_frechet_mean_shift():
    """For equal covariance, FD == ||mu1 - mu2||^2."""
    n, d = 4000, 8
    rng = np.random.default_rng(0)
    a = rng.normal(size=(n, d))
    b = a + 3.0
    fd = fid_from_features(a, b)
    assert abs(fd - 9.0 * d) < 1.0, fd


def test_frechet_scale():
    """1-D gaussians: FD = (mu1-mu2)^2 + (s1 - s2)^2."""
    mu1, s1 = np.array([0.0]), np.array([[4.0]])
    mu2, s2 = np.array([1.0]), np.array([[1.0]])
    fd = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(fd, 1.0 + (2.0 - 1.0) ** 2, atol=1e-6)


def test_mmd_identical_much_smaller_than_separated(rng_np):
    """The estimator (unbiased XX/YY, biased XY — reference mmd.py:34-55)
    is not exactly 0 on identical sets, but it must be orders of magnitude
    below the separated-distribution value."""
    f = rng_np.normal(size=(256, 8))
    same = abs(polynomial_mmd(f, f.copy()))
    apart = polynomial_mmd(f, rng_np.normal(size=(256, 8)) + 2.0)
    assert apart > 100 * same, (same, apart)


def test_mmd_subsets_runs(rng_np):
    from freefine_tpu.metrics.common import compute_mmd_subsets

    a = rng_np.normal(size=(64, 8))
    b = rng_np.normal(size=(64, 8)) + 1.0
    v = compute_mmd_subsets(a, b, n_subsets=5, subset_size=32)
    assert v > 0


def test_wrap_error_exact():
    coarse = np.zeros((8, 8, 3), np.uint8)
    gen = np.zeros((8, 8, 3), np.uint8)
    mask = np.zeros((8, 8), np.uint8)
    mask[:2, :2] = 255
    gen[0, 0] = 255  # one fully-wrong pixel inside a 4-pixel mask
    # sum|diff| = 3 channels * 1.0 ; mask3.sum() = 4*3
    want = 3.0 / 12.0
    np.testing.assert_allclose(wrap_error_single(coarse, gen, mask), want)


def test_wrap_error_empty_mask():
    z = np.zeros((8, 8, 3), np.uint8)
    assert wrap_error_single(z, z, np.zeros((8, 8), np.uint8)) == 0.0


def _mean_encoder(img):
    """Toy encoder: per-channel means + flattened 4x4 pooling."""
    x = img.astype(np.float64)
    pooled = x.reshape(4, x.shape[0] // 4, 4, x.shape[1] // 4, 3).mean((1, 3))
    return pooled.ravel()


def test_bgc_ignores_masked_object(rng_np):
    src = rng_np.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    gen = src.copy()
    mask = np.zeros((64, 64), np.uint8)
    mask[16:32, 16:32] = 255
    # change the object region only -> background identical -> BGC == 1
    gen[16:32, 16:32] = 0
    v = background_consistency_single(src, gen, mask, mask, _mean_encoder)
    assert v > 0.9999


def test_subc_compares_subjects(rng_np):
    src = rng_np.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    gen = np.zeros_like(src)
    mask_s = np.zeros((64, 64), np.uint8)
    mask_s[0:16, 0:16] = 255
    mask_t = np.zeros((64, 64), np.uint8)
    mask_t[32:48, 32:48] = 255
    gen[32:48, 32:48] = src[0:16, 0:16]  # subject moved verbatim

    def hist_encoder(img):  # location-invariant toy encoder
        x = img.astype(np.float64)
        return np.histogram(x[x.sum(-1) > 0], bins=16, range=(0, 255))[0] + 1.0

    v = subject_consistency_single(src, gen, mask_s, mask_t, hist_encoder)
    rnd = np.zeros_like(src)
    rnd[32:48, 32:48] = 200  # different subject content
    v_bad = subject_consistency_single(src, rnd, mask_s, mask_t, hist_encoder)
    assert v > v_bad and v > 0.99


def test_cli_wrap_e_only(tmp_path):
    """metrics.main --task 000001000 over a synthetic results JSON."""
    import json

    from PIL import Image

    from freefine_tpu.metrics.main import main as metrics_main

    img = np.zeros((16, 16, 3), np.uint8)
    mask = np.zeros((16, 16), np.uint8)
    mask[:4, :4] = 255
    paths = {}
    for name, arr in (("c.png", img), ("g.png", img + 10), ("m.png", mask)):
        p = str(tmp_path / name)
        Image.fromarray(arr if arr.ndim == 3 else arr).save(p)
        paths[name] = p
    data = {
        "da0": {"instances": {"0": {"0": {
            "edit_prompt": "lightly move it",
            "coarse_input_path": paths["c.png"],
            "gen_img_path": paths["g.png"],
            "tgt_mask_path": paths["m.png"],
        }}}}
    }
    jp = str(tmp_path / "results.json")
    json.dump(data, open(jp, "w"))
    result = metrics_main(["--path", jp, "--task", "000001000"])
    np.testing.assert_allclose(result["WRAP_E"], 10.0 / 255.0, atol=1e-6)
