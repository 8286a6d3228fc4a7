"""RegionDrag baseline core tests: region mapping, cycle consistency,
K/V-paste attention routing, and the end-to-end drag smoke run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.baselines.region_drag import (
    RegionDrag,
    forward_sde_step,
    pad_points,
    region_pair_to_pts,
    reverse_step,
)
from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.edit import EditConfig
from freefine_tpu.ops.attention import edit_self_attention, sdpa
from freefine_tpu.pipeline import FreeFine
from freefine_tpu.schedulers.ddim import DDIMSchedule


def test_region_pair_to_pts_translation():
    # a pure translation maps every target pixel back to its shifted source
    src = np.zeros((32, 32), np.uint8)
    trg = np.zeros((32, 32), np.uint8)
    src[4:10, 6:14] = 255
    trg[14:20, 16:24] = 255
    s, t = region_pair_to_pts(src, trg)
    assert len(s) == len(t) == 6 * 8
    np.testing.assert_array_equal(t - s, np.full_like(s, 10))


def test_region_pair_to_pts_scale():
    # target twice the source size: corners map to corners
    src = np.zeros((64, 64), np.uint8)
    trg = np.zeros((64, 64), np.uint8)
    src[10:20, 10:20] = 255
    trg[20:40, 20:40] = 255
    s, t = region_pair_to_pts(src, trg)
    lut = {tuple(tp): tuple(sp) for sp, tp in zip(s, t)}
    assert lut[(20, 20)] == (10, 10)
    assert lut[(39, 39)] == (19, 19)


def test_pad_points_drop_semantics():
    pts = np.array([[1, 2], [3, 4]])
    out = pad_points(pts, 4, oob=99)
    np.testing.assert_array_equal(out[:2], pts)
    assert (out[2:] == 99).all()


def test_cycle_consistency():
    """The recovered SDE noise must make the reverse step reproduce the
    forward trajectory exactly (cycle_sde.py:132-150)."""
    schedule = DDIMSchedule.create(num_inference_steps=10)
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4), jnp.float32)

    # a stand-in denoiser that is deterministic in (x, t)
    def eps_fn(z, t):
        return 0.1 * z + 0.01 * t.astype(jnp.float32)

    t = jnp.int32(301)
    x_next, noise = forward_sde_step(schedule, eps_fn, t, x, rng)
    eps = eps_fn(x_next, t + schedule.step_delta)
    x_back = reverse_step(
        schedule, eps, t + schedule.step_delta, x_next, noise, sde=True
    )
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)


def test_drag_mode_attention_routing():
    # stream 0 must attend with stream 1's K/V; stream 1 is vanilla
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
    cfg = EditConfig(mode="drag", method=None, local_cfg=False, num_streams=2,
                     layer_range=(0, 10**6), tca_scope=("down", "mid", "up"))
    out = edit_self_attention(q, k, v, 2, cfg, None, 0, "down")
    ref0 = sdpa(q[:1], k[1:], v[1:], 2)
    ref1 = sdpa(q[1:], k[1:], v[1:], 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1[0]), atol=1e-5)

    # out-of-scope layers fall through to vanilla attention
    cfg_gated = EditConfig(mode="drag", method=None, local_cfg=False,
                           num_streams=2, layer_range=(10, 16))
    out2 = edit_self_attention(q, k, v, 2, cfg_gated, None, 0, "down")
    ref_plain = sdpa(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref_plain), atol=1e-5)

    # masactrl flavour: all streams use stream 0's K/V
    cfg0 = EditConfig(mode="drag", method=None, local_cfg=False, num_streams=2,
                      kv_source_stream=0, layer_range=(0, 10**6),
                      tca_scope=("down", "mid", "up"))
    out3 = edit_self_attention(q, k, v, 2, cfg0, None, 0, "down")
    ref0a = sdpa(q[:1], k[:1], v[:1], 2)
    ref1a = sdpa(q[1:], k[:1], v[:1], 2)
    np.testing.assert_allclose(np.asarray(out3[0]), np.asarray(ref0a[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out3[1]), np.asarray(ref1a[0]), atol=1e-5)


@pytest.mark.slow
def test_drag_end_to_end_tiny():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    rd = RegionDrag(pipe)
    h = w = pipe.config.height
    r = np.random.default_rng(5)
    img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
    src_region = np.zeros((h, w), np.uint8)
    trg_region = np.zeros((h, w), np.uint8)
    src_region[8:20, 8:20] = 255
    trg_region[24:36, 24:36] = 255

    out = rd.drag_regions(img, src_region, trg_region, "a cat",
                          steps=8, start_t=0.5, end_t=0.25)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()
    assert not np.array_equal(out, img)

    # ODE variant compiles and runs too
    out2 = rd.drag_regions(img, src_region, trg_region, "a cat",
                           steps=8, start_t=0.5, end_t=0.25,
                           method="cp_then_encode")
    assert out2.shape == (h, w, 3)


@pytest.mark.slow
def test_drag_batch_matches_vmapped_lanes():
    """The batched forward/backward equal per-lane single-jit runs given
    the same per-case RNG keys (vmap correctness), and drag_batch runs
    end to end deterministically."""
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    rd = RegionDrag(pipe)
    lh, lw = pipe.config.latent_height, pipe.config.latent_width
    steps, k, n_pts = 4, 2, 8
    _, _, fwd, _, fwd_b, _ = rd._loops(steps, k, True, n_pts, 0.0)

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(2, 1, lh, lw, 4)), jnp.float32)
    ctx = pipe.encode_text(["a", "b"])[:, None]
    keys = jax.random.split(jax.random.key(7), 2)

    hooks_b, noises_b = fwd_b(pipe.params, lat, ctx, keys)
    for i in range(2):
        h_i, n_i = fwd(pipe.params, lat[i], ctx[i], keys[i], None)
        np.testing.assert_allclose(np.asarray(hooks_b[i]), np.asarray(h_i),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(noises_b[i]), np.asarray(n_i),
                                   atol=2e-4)

    h = w = pipe.config.height
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    items = [
        dict(ori_image=img, source_pts=np.array([[16, 16]]),
             target_pts=np.array([[24, 16]])),
        dict(ori_image=img[::-1].copy(), source_pts=np.array([[20, 20]]),
             target_pts=np.array([[28, 20]])),
    ]
    outs = rd.drag_batch(items, ["p1", "p2"], steps=4, start_t=0.5,
                         end_t=0.25)
    outs2 = rd.drag_batch(items, ["p1", "p2"], steps=4, start_t=0.5,
                          end_t=0.25)
    assert len(outs) == 2
    for o, o2 in zip(outs, outs2):
        assert o.shape == (h, w, 3) and o.dtype == np.uint8
        np.testing.assert_array_equal(o, o2)

    # per-case seeds: a case's output is independent of batch composition
    a = rd.drag_batch(items, ["p1", "p2"], seed=[5, 7], steps=4,
                      start_t=0.5, end_t=0.25)
    b = rd.drag_batch([items[0], items[0]], ["p1", "p1"], seed=[5, 9],
                      steps=4, start_t=0.5, end_t=0.25)
    np.testing.assert_array_equal(a[0], b[0])


@pytest.mark.slow
def test_baseline_eval_region_drag_batched(tmp_path):
    """Driver batch_size>1 routes through drag_batch with tail padding."""
    from tests.test_baseline_eval import _mini_annotations

    from freefine_tpu.baselines.eval import run_geobench_baseline

    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    ann = _mini_annotations(tmp_path, n_edit=3)
    merged = run_geobench_baseline(
        pipe, ann, str(tmp_path / "out_batched"), baseline="region_drag",
        batch_size=2, steps=4, start_t=0.5, end_t=0.25,
    )
    cases = merged["da0"]["instances"]["0"]
    assert len(cases) == 3
    import os.path as osp

    assert all(osp.exists(c["gen_img_path"]) for c in cases.values())
