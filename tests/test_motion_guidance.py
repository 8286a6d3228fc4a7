"""RAFT + MotionGuidance tests: encoder shapes, GRU math, convex
upsampling, converter roundtrip against a synthetic torch-layout state
dict, flow-energy properties, and the e2e tiny guided edit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.baselines.motion_guidance import (
    MotionGuidance,
    gen_flow,
    make_flow_loss,
    occlusion_mask,
    warp,
)
from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.models.raft import (
    RAFT,
    RAFTConfig,
    convert_raft,
    upsample_flow_convex,
    _torch_key,
)
from freefine_tpu.pipeline import FreeFine


def tiny_raft():
    return RAFT(config=RAFTConfig(iters=2))


def test_warp_identity_and_shift():
    im = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    zero = jnp.zeros((1, 4, 4, 2))
    np.testing.assert_allclose(np.asarray(warp(im, zero)), np.asarray(im))
    # flow (+1, 0): output[y, x] = input[y, x+1]
    one_x = jnp.zeros((1, 4, 4, 2)).at[..., 0].set(1.0)
    out = np.asarray(warp(im, one_x))
    np.testing.assert_allclose(out[0, :, :3, 0], np.asarray(im)[0, :, 1:, 0])


def test_gen_flow_translation_and_rotation():
    mask = np.zeros((16, 16), np.uint8)
    mask[4:8, 4:8] = 255
    f = gen_flow([3, -2, 0, 0, 0, 0, 1, 1, 1], mask)
    assert f.shape == (1, 16, 16, 2)
    assert f[0, 5, 5, 0] == 3 and f[0, 5, 5, 1] == -2
    assert f[0, 0, 0, 0] == 0
    # rotation: centroid stays fixed
    fr = gen_flow([0, 0, 0, 0, 0, 90, 1, 1, 1], mask)
    cy = cx = (4 + 7) / 2
    assert abs(fr[0, int(cy), int(cx)].sum()) < 1.5


def test_occlusion_mask_keeps_moving_pixels():
    flow = jnp.zeros((1, 8, 8, 2)).at[0, 2:4, 2:4, 0].set(3.0)
    m = occlusion_mask(flow)
    assert m.shape == (1, 8, 8, 1)
    # moving pixels always unmasked
    assert float(m[0, 2, 2, 0]) == 1.0


def test_upsample_flow_convex_uniform_mask():
    flow = jnp.ones((1, 4, 4, 2))
    mask = jnp.zeros((1, 4, 4, 64 * 9))  # uniform softmax over the 9 taps
    up = upsample_flow_convex(flow, mask)
    assert up.shape == (1, 32, 32, 2)
    # true interior (coarse cell (1,1), all 9 neighbours in-grid):
    # all neighbours equal -> exactly 8x flow
    np.testing.assert_allclose(np.asarray(up[0, 12, 12]), [8.0, 8.0],
                               atol=1e-5)
    # border cells average zero-padded neighbours: 4/9 of the mass at the
    # corner
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), [32 / 9] * 2,
                               atol=1e-4)


def test_raft_forward_shapes():
    model = tiny_raft()
    x1 = jnp.zeros((1, 64, 64, 3))
    x2 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x1, x2)
    flow = model.apply(params, x1, x2)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_converter_roundtrip():
    model = tiny_raft()
    # 64^2 input: the 1/8-res grid must support 4 correlation levels
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(1), x, x)

    from flax import traverse_util

    rng = np.random.default_rng(0)
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    sd = {}
    for path, arr in flat.items():
        t = rng.normal(size=np.asarray(arr).shape).astype(np.float32)
        if path.endswith("/kernel"):
            t = t.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        sd["module." + _torch_key(path)] = t
    out = convert_raft(params, sd)
    got = traverse_util.flatten_dict(out["params"], sep="/")
    for path, arr in flat.items():
        t = sd["module." + _torch_key(path)]
        expect = t.transpose(2, 3, 1, 0) if path.endswith("/kernel") else t
        np.testing.assert_allclose(np.asarray(got[path]), expect)
    # the mapping covers distinct torch keys one-to-one
    assert len(sd) == len(flat)


def test_flow_loss_zero_for_perfect_match():
    # identical images + zero target flow: a RAFT stub returning zero flow
    # must give zero loss
    def raft_zero(a, b):
        return jnp.zeros(a.shape[:3] + (2,), jnp.float32)

    loss = make_flow_loss(raft_zero, jnp.zeros((1, 16, 16, 2)))
    img = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (1, 16, 16, 3)),
                      jnp.float32)
    assert float(loss(img, img)) < 1e-6
    # differing images are penalised
    img2 = jnp.clip(img + 0.5, -1, 1)
    assert float(loss(img2, img)) > 0.01


@pytest.mark.slow
def test_motion_guidance_end_to_end_tiny():
    pipe = FreeFine(config=tiny_pipeline_config(), init_random=True)
    h = w = pipe.config.height
    raft = tiny_raft()
    x = jnp.zeros((1, h, w, 3))
    raft_params = raft.init(jax.random.key(3), x, x)
    mg = MotionGuidance(pipe, raft, raft_params)

    img = np.random.default_rng(4).integers(0, 255, (h, w, 3), dtype=np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[16:32, 16:32] = 255
    out = mg.edit(img, [8, 0, 0, 0, 0, 0, 1, 1, 1], mask, "a photo",
                  steps=3, num_recursive=2, guidance_weight=10.0)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()
