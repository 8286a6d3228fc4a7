"""Golden tests against the reference's OWN scheduler/mask code.

Counterpart of tests/test_reference_golden.py one layer up: imports
``/root/reference/src/demo/model.py`` (reviewed before import — its own code
is torch/numpy/cv2/matplotlib; the heavyweight deps it imports at module
level are stubbed in sys.modules below) and pins our pure-function scheduler
and mask builders against the reference methods on identical inputs:

  * ``inv_step``                      (model.py:109-132) -> schedulers.ddim.inv_step
  * ``ctrl_step`` / ``_get_variance`` (model.py:134-209) -> schedulers.ddim.ctrl_step
  * ``linear_param``                  (model.py:438-455) -> linear_context_guidance
  * ``prepare_tensor_mask``           (model.py:1621-1639) -> masks.prepare_mask
  * ``prepare_various_mask``          (model.py:1432-1512) -> masks.prepare_various_mask
  * ``prepare_composition_masks``     (model.py:1515-1609) -> masks.prepare_composition_masks
  * ``prepare_mask_bggen``            (model.py:1611-1620) -> masks.prepare_mask_bggen

Import stubs: ``diffusers`` (StableDiffusionPipeline base + randn_tensor),
``pytorch_lightning`` (seed_everything / rank_zero_warn), ``rembg``
(remove).  The pipeline object is created via ``__new__`` with a minimal
scheduler namespace exposing ``alphas_cumprod`` — OUR schedule table, so
these tests pin the step *math* given a shared table (the table itself is
pinned against the diffusers scaled_linear formula in test_schedulers.py).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from freefine_tpu import masks as M
from freefine_tpu.schedulers.ddim import (
    DDIMSchedule,
    ctrl_step,
    inv_step,
    linear_context_guidance,
)

REF_MODEL = "/root/reference/src/demo/model.py"

# the noise array the randn_tensor stub returns (set per-test)
_NOISE = {}


@pytest.fixture(scope="module")
def refmod():
    import matplotlib

    matplotlib.use("Agg")

    from golden_stubs import make_module as mod
    from golden_stubs import override

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.from_numpy(_NOISE["next"]).to(dtype or torch.float32)

    # installed unconditionally (other golden files own incompatible
    # diffusers stubs); override() restores prior state on teardown.
    d = mod("diffusers", StableDiffusionPipeline=object, DDIMScheduler=object)
    du = mod("diffusers.utils")
    dut = mod("diffusers.utils.torch_utils", randn_tensor=randn_tensor)
    d.utils = du
    pl = mod("pytorch_lightning", seed_everything=lambda *a, **k: 0)
    plu = mod(
        "pytorch_lightning.utilities",
        rank_zero_warn=lambda *a, **k: None,
    )
    pl.utilities = plu
    restore = override({
        "diffusers": d,
        "diffusers.utils": du,
        "diffusers.utils.torch_utils": dut,
        "pytorch_lightning": pl,
        "pytorch_lightning.utilities": plu,
        "rembg": mod("rembg", remove=lambda x, *a, **k: x),
    })
    # `from src.utils.attention import override_forward`
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    spec = importlib.util.spec_from_file_location("ref_model", REF_MODEL)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    yield m
    restore()


@pytest.fixture(scope="module")
def schedule():
    return DDIMSchedule.create(num_inference_steps=50)


@pytest.fixture(scope="module")
def pipe(refmod, schedule):
    p = refmod.FreeFinePipeline.__new__(refmod.FreeFinePipeline)
    sched = types.SimpleNamespace(
        config=types.SimpleNamespace(num_train_timesteps=1000),
        num_inference_steps=50,
        alphas_cumprod=torch.from_numpy(np.asarray(schedule.alphas_cumprod)),
        final_alpha_cumprod=torch.tensor(
            float(schedule.final_alpha_cumprod)
        ),
    )
    object.__setattr__(p, "scheduler", sched)
    object.__setattr__(p, "device", torch.device("cpu"))
    return p


# ---------------------------------------------------------------------------
# scheduler math
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("t", [981, 501, 21, 1])
def test_inv_step_matches(pipe, schedule, t):
    rng = np.random.RandomState(t)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    eps = rng.randn(1, 4, 8, 8).astype(np.float32)
    want_x, want_x0 = pipe.inv_step(
        torch.from_numpy(eps), t, torch.from_numpy(x)
    )
    got_x, got_x0 = inv_step(
        schedule, jnp.asarray(eps), jnp.int32(t), jnp.asarray(x)
    )
    np.testing.assert_allclose(got_x, want_x.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_x0, want_x0.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("t", [981, 501, 21, 1])
def test_get_variance_matches(pipe, schedule, t):
    want = pipe._get_variance(t, t - schedule.step_delta)
    got = schedule.variance(jnp.int32(t))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


@pytest.mark.parametrize("t", [981, 501, 21, 1])
@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_ctrl_step_full_ddpm(pipe, schedule, t, eta, monkeypatch):
    """mask=None branch: full-DDPM direction + eta noise."""
    rng = np.random.RandomState(t)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    eps = rng.randn(1, 4, 8, 8).astype(np.float32)
    noise = rng.randn(1, 4, 8, 8).astype(np.float32)
    _NOISE["next"] = noise
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.asarray(noise).astype(dtype),
    )
    want_x, want_x0 = pipe.ctrl_step(
        torch.from_numpy(eps), t, torch.from_numpy(x), None, eta=eta
    )
    got_x, got_x0 = ctrl_step(
        schedule, jnp.asarray(eps), jnp.int32(t), jnp.asarray(x),
        None, eta, jax.random.key(0),
    )
    np.testing.assert_allclose(got_x, want_x.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_x0, want_x0.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("t", [981, 21])
@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_ctrl_step_two_stream_masked(pipe, schedule, t, eta, monkeypatch):
    """The 2-row reference-stream branch (model.py:169-174): stream 0 gets
    local DDPM inside the mask, stream 1 (the pinned reference) stays pure
    DDIM.  Reference layout NCHW; ours NHWC."""
    rng = np.random.RandomState(t + 7)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    eps = rng.randn(2, 4, 8, 8).astype(np.float32)
    noise = rng.randn(2, 4, 8, 8).astype(np.float32)
    mask = (rng.rand(8, 8) > 0.5).astype(np.float32)
    _NOISE["next"] = noise

    want_x, want_x0 = pipe.ctrl_step(
        torch.from_numpy(eps), t, torch.from_numpy(x),
        torch.from_numpy(mask)[None, None], eta=eta,
    )

    nhwc = lambda a: a.transpose(0, 2, 3, 1)
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.asarray(
            nhwc(noise)
        ).astype(dtype),
    )
    got_x, got_x0 = ctrl_step(
        schedule, jnp.asarray(nhwc(eps)), jnp.int32(t),
        jnp.asarray(nhwc(x)), jnp.asarray(mask), eta,
        jax.random.key(0), ddim_streams_from=1,
    )
    np.testing.assert_allclose(
        got_x, nhwc(want_x.numpy()), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        got_x0, nhwc(want_x0.numpy()), rtol=1e-5, atol=1e-6
    )


def test_linear_param_matches(pipe):
    for start, end, num, scale in [(35, 45, 50, 0.5), (25, 50, 50, 0.0),
                                   (30, 40, 50, 0.7)]:
        for i in range(start, num):
            want = pipe.linear_param(i, start, end, num, end_scale=scale)
            got = linear_context_guidance(i, start, end, num, scale)
            np.testing.assert_allclose(float(got), float(want), atol=1e-6)


# ---------------------------------------------------------------------------
# mask builders
# ---------------------------------------------------------------------------


def _blob(rng, h, w, lo=0.2, hi=0.6):
    """Random filled rectangle-ish binary mask (uint8, like cv2 masks)."""
    y0 = int(rng.rand() * h * lo)
    x0 = int(rng.rand() * w * lo)
    y1 = y0 + int(h * lo + rng.rand() * h * (hi - lo))
    x1 = x0 + int(w * lo + rng.rand() * w * (hi - lo))
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


@pytest.mark.parametrize("size,sup", [((96, 96), 96), ((120, 88), 64)])
@pytest.mark.parametrize("binary", [True, False])
def test_prepare_tensor_mask_matches(pipe, size, sup, binary):
    rng = np.random.RandomState(0)
    m = (_blob(rng, *size) * 37).astype(np.float32)  # non-0/1 values
    want = pipe.prepare_tensor_mask(
        torch.from_numpy(m), sup, sup, binary=binary
    ).numpy()
    got = np.asarray(M.prepare_mask(jnp.asarray(m), sup, sup, binary=binary))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("use_auto_draw", [False, True])
@pytest.mark.parametrize("reduce_inp", [False, True])
def test_prepare_various_mask_matches(pipe, use_auto_draw, reduce_inp):
    rng = np.random.RandomState(3)
    h = w = 96
    lh = lw = 12
    shifted = _blob(rng, h, w)
    ori = _blob(rng, h, w)
    draw = _blob(rng, h, w)
    cons = np.clip(_blob(rng, h, w) + ori, 0, 1).astype(np.uint8)
    init_code = torch.zeros(1, 4, lh, lw)

    want = pipe.prepare_various_mask(
        shifted, ori, draw, w, h, init_code,
        verbose=True,  # `if not verbose: temp_view(...)` — skip plotting
        use_auto_draw=use_auto_draw, cons_area=cons,
        reduce_inp_artifacts=reduce_inp,
    )
    w_fg, w_shifted, w_ori, w_complete, w_lv = [t.numpy() for t in want]

    got = M.prepare_various_mask(
        jnp.asarray(shifted), jnp.asarray(ori), jnp.asarray(draw),
        h, w, lh, lw,
        use_auto_draw=use_auto_draw, cons_area=jnp.asarray(cons),
        reduce_inp_artifacts=reduce_inp,
    )
    np.testing.assert_allclose(np.asarray(got.fg_retain), w_fg, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.fg_retain_st2), w_shifted, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(got.fg_ref), w_ori, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.completion_cfg), w_complete, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(got.local_var), w_lv, atol=1e-6)


@pytest.mark.parametrize("variant", ["plain", "dil", "draw", "appearance"])
def test_prepare_composition_masks_matches(pipe, variant):
    rng = np.random.RandomState(11)
    h = w = 96
    lh = lw = 12
    n = 2
    oris = [_blob(rng, h, w) for _ in range(n)]
    tgts = [_blob(rng, h, w) for _ in range(n)]
    draws = [_blob(rng, h, w) for _ in range(n)]
    init_code = torch.zeros(1, 4, lh, lw)

    kw_ref = dict(dil_completion=False, draw_mask=None,
                  appearance_transfer=False)
    kw_got = dict(dil_completion=False, draw_masks=None,
                  appearance_transfer=False)
    if variant == "dil":
        kw_ref["dil_completion"] = kw_got["dil_completion"] = True
    elif variant == "draw":
        kw_ref["draw_mask"] = draws
        kw_got["draw_masks"] = [jnp.asarray(d) for d in draws]
    elif variant == "appearance":
        kw_ref["appearance_transfer"] = kw_got["appearance_transfer"] = True

    w_tgt, w_src, w_lv, w_cfg = [
        t.numpy()
        for t in pipe.prepare_composition_masks(
            oris, tgts, w, h, init_code, **kw_ref
        )
    ]
    got = M.prepare_composition_masks(
        [jnp.asarray(m) for m in oris], [jnp.asarray(m) for m in tgts],
        h, w, lh, lw, **kw_got,
    )
    np.testing.assert_allclose(np.asarray(got.tgt_masks), w_tgt, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.src_masks), w_src, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.local_var), w_lv, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.completion_cfg), w_cfg, atol=1e-6
    )


def test_prepare_mask_bggen_matches(pipe):
    rng = np.random.RandomState(5)
    h = w = 96
    lh = lw = 12
    m = _blob(rng, h, w)
    init_code = torch.zeros(1, 4, lh, lw)
    w_full, w_lv = [
        t.numpy() for t in pipe.prepare_mask_bggen(m, w, h, init_code)
    ]
    g_full, g_lv = M.prepare_mask_bggen(jnp.asarray(m), h, w, lh, lw)
    np.testing.assert_allclose(np.asarray(g_full), w_full, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_lv), w_lv, atol=1e-6)
