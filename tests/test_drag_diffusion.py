"""DragDiffusion baseline core tests: LoRA machinery, point ops, and the
end-to-end drag (training + optimization + masactrl denoise) on the tiny
config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.baselines.drag_diffusion import (
    DragDiffusion,
    init_lora,
    lora_paths,
    merge_lora,
    sample_patch,
    track_point,
    train_lora,
)
from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.pipeline import FreeFine


@pytest.fixture(scope="module")
def pipe():
    return FreeFine(config=tiny_pipeline_config(), init_random=True)


def test_lora_paths_cover_attention(pipe):
    paths = lora_paths(pipe.params["unet"])
    assert paths, "no adaptable kernels found"
    names = {p[-2] for p in paths}
    assert names == {"to_q", "to_k", "to_v", "to_out_0"}


def test_lora_init_is_identity(pipe):
    lora = init_lora(pipe.params["unet"], rank=4, rng=jax.random.key(0))
    merged = merge_lora(pipe.params["unet"], lora)
    # B is zero-initialised: merged == base exactly
    base = jax.tree_util.tree_leaves(pipe.params["unet"])
    new = jax.tree_util.tree_leaves(merged)
    for a, b in zip(base, new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_lora_applies_delta(pipe):
    lora = init_lora(pipe.params["unet"], rank=4, rng=jax.random.key(0))
    key = next(iter(lora))
    lora[key]["b"] = jnp.ones_like(lora[key]["b"])
    merged = merge_lora(pipe.params["unet"], lora)
    from flax import traverse_util

    p = tuple(key.split("/"))
    base = traverse_util.flatten_dict(pipe.params["unet"]["params"])[p]
    new = traverse_util.flatten_dict(merged["params"])[p]
    expect = np.asarray(base) + np.asarray(
        lora[key]["a"] @ lora[key]["b"]
    ).astype(np.asarray(base).dtype)
    np.testing.assert_allclose(np.asarray(new), expect, rtol=1e-3, atol=1e-3)


def test_sample_patch_integer_grid():
    feat = jnp.arange(5 * 5, dtype=jnp.float32).reshape(5, 5, 1)
    yy, xx = jnp.meshgrid(jnp.arange(1.0, 4.0), jnp.arange(1.0, 4.0),
                          indexing="ij")
    patch = sample_patch(feat, yy, xx)
    np.testing.assert_allclose(
        np.asarray(patch[..., 0]), np.asarray(feat[1:4, 1:4, 0])
    )


def test_track_point_finds_shifted_feature():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(16, 16, 8)), jnp.float32)
    p0 = jnp.asarray([5.0, 6.0])
    f0 = feat[5, 6]
    # track from a drifted guess: exact match must be recovered
    guess = jnp.asarray([6.0, 7.0])
    found = track_point(f0, feat, guess, r_p=3)
    np.testing.assert_array_equal(np.asarray(found), [5.0, 6.0])


@pytest.mark.slow
def test_train_lora_reduces_loss(pipe):
    h = w = pipe.config.height
    img = np.random.default_rng(1).integers(0, 255, (h, w, 3), dtype=np.uint8)
    lora = train_lora(pipe, img, "a cat", rank=2, steps=3, lr=1e-3)
    # factors moved off their init (B no longer all-zero)
    moved = any(
        float(jnp.abs(ab["b"]).sum()) > 0 for ab in lora.values()
    )
    assert moved


@pytest.mark.slow
def test_drag_end_to_end_tiny(pipe):
    dd = DragDiffusion(pipe)
    h = w = pipe.config.height
    img = np.random.default_rng(2).integers(0, 255, (h, w, 3), dtype=np.uint8)
    handles = np.array([[h // 3, w // 3]])
    targets = np.array([[h // 2, w // 2]])
    out = dd.drag(
        img, handles, targets, "a cat",
        n_pix_step=3, train_lora_steps=2, lora_rank=2, max_points=4,
    )
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()
