"""Golden tests of the FULL sampling loops against the reference's OWN code.

test_reference_golden_model.py pins the per-step math (inv_step, ctrl_step,
linear_param, mask builders) against /root/reference/src/demo/model.py; this
file pins the LOOPS themselves — the last unpinned layer of the core
algorithm: stream layout, CFG application order, reference-stream re-pin
indexing, context-guidance scheduling, and scheduler-state threading across
whole trajectories.

Method: the reference pipeline skeleton is instantiated via ``__new__`` with
a deterministic STUB UNet (the same closed-form function implemented in
numpy for the torch side and jnp for our scan loops — elementwise rational
maps plus a position-weighted batch-coupling term, so any stream-order or
layout drift changes the numbers), stub tokenizer/text-encoder (a fixed
prompt -> [77, D] table shared by both sides), an identity-decode VAE stub,
and a ``randn_tensor`` stub fed the exact noise sequence our scan's
``jax.random.split`` chain draws.  Then the reference's actual

  * ``invert``                          (model.py:817-925)
  * ``forward_sampling``               (model.py:476-622)
  * ``forward_sampling_background_gen`` (model.py:656-812)
  * ``forward_sampling_compose``       (model.py:301-435)
  * full entries ``FreeFine_generation`` (:1012), ``FreeFine_background_
    generation`` (:1088), ``FreeFine_cross_image_composition`` (:1051,
    appearance_transfer both ways)

run end-to-end and the full latent trajectories are compared against
``ddim_invert_loop`` / ``sample_edit_loop`` / ``sample_bggen_loop`` /
``sample_compose_loop`` over a (start_step, end_step, eta, method_type)
grid at f32.

Scope notes (each pinned elsewhere):
  * The stub's modulation gate covers tca / mmsa / mmsa_es scheduling
    (context_guidance + the use_tca flip, model.py:587-591); ssa/sdsa differ
    only inside the attention layer (test_reference_golden.py).
  * Our loops use the reference's legacy 4-stream CFG layout here
    ([u_e, u_r, c_e, c_r]); the production 3-stream dedup is pinned equal to
    it in tests/test_stream_dedup.py (on the real UNet — the stub's batch
    coupling is intentionally NOT dedup-invariant).
  * The compose stub ignores text embeddings: the reference feeds
    forward_sampling_compose N+P+2 embedding rows for N+2 latent streams and
    routes text per-region inside cross-attention (attention.py:1394-1432),
    which is attention-layer semantics pinned in test_reference_golden.py.
  * VAE encode/decode and CLIP text encoding are replaced by shared
    deterministic stubs on BOTH sides; the real bridges are pinned in
    test_hf_parity.py / test_weights.py.
"""

from __future__ import annotations

import collections
import importlib.util
import sys
import types
import zlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from freefine_tpu import masks as M
from freefine_tpu.edit import EditConfig, EditState
from freefine_tpu.pipeline import (
    _method_and_gates,
    ddim_invert_loop,
    sample_bggen_loop,
    sample_compose_loop,
    sample_edit_loop,
)
from freefine_tpu.schedulers.ddim import DDIMSchedule

REF_MODEL = "/root/reference/src/demo/model.py"

NUM = 10          # num_inference_steps for the grid
LH = LW = 12      # latent grid
H = W = 96        # image size for the full-entry tests
EMB_D = 8         # stub text-embedding width
GS = 7.5          # guidance scale

# FIFO of upcoming torch-side variance noises (NCHW numpy arrays); the
# diffusers randn_tensor stub pops from it.
_NOISE_Q: collections.deque = collections.deque()


# ---------------------------------------------------------------------------
# reference import (same stub kit as test_reference_golden_model.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def refmod():
    import matplotlib

    matplotlib.use("Agg")

    from golden_stubs import make_module as mod
    from golden_stubs import override

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        arr = _NOISE_Q.popleft()
        assert tuple(arr.shape) == tuple(shape), (arr.shape, shape)
        return torch.from_numpy(arr).to(dtype or torch.float32)

    d = mod("diffusers", StableDiffusionPipeline=object, DDIMScheduler=object)
    du = mod("diffusers.utils")
    dut = mod("diffusers.utils.torch_utils", randn_tensor=randn_tensor)
    d.utils = du
    pl = mod("pytorch_lightning", seed_everything=lambda *a, **k: 0)
    plu = mod(
        "pytorch_lightning.utilities", rank_zero_warn=lambda *a, **k: None
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
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location("ref_model_loops", REF_MODEL)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    yield m
    restore()


@pytest.fixture(scope="module")
def schedule():
    return DDIMSchedule.create(num_inference_steps=NUM)


# ---------------------------------------------------------------------------
# shared deterministic stubs
# ---------------------------------------------------------------------------

_EMB_CACHE: dict = {}


def emb_of(prompt: str) -> np.ndarray:
    """Fixed [77, EMB_D] embedding per prompt (shared by both sides)."""
    if prompt not in _EMB_CACHE:
        seed = zlib.crc32(("emb:" + prompt).encode()) & 0x7FFFFFFF
        _EMB_CACHE[prompt] = (
            np.random.RandomState(seed).randn(77, EMB_D).astype(np.float32)
        )
    return _EMB_CACHE[prompt]


# Stub UNet eps = C1*x + C2*x/(1+0.25x^2) + C3*t/1000
#                + C4*emb[b,0,4] + C5*emb[b,0,:4]   (iff emb rows == x rows)
#                + s*CC * sum_b x[b]/(b+2)          (batch coupling, gated)
C1, C2, C3, C4, C5, CC = 0.55, 0.2, 0.03, 0.08, 0.05, 0.07


def stub_eps_np(x, t, emb, s):
    """numpy stub UNet; x [B, h, w, 4] NHWC f32, emb [B, 77, D] or None."""
    u = x / (1.0 + 0.25 * x * x)
    out = C1 * x + C2 * u + np.float32(C3 * (float(t) / 1000.0))
    if emb is not None:
        g = emb[:, 0, 4]
        v = emb[:, 0, :4]
        out = out + C4 * g[:, None, None, None] + C5 * v[:, None, None, :]
    w = (1.0 / (np.arange(x.shape[0]) + 2.0)).astype(np.float32)
    couple = (w[:, None, None, None] * x).sum(0)
    return out + (np.float32(s) * np.float32(CC)) * couple[None]


def stub_eps_jnp(x, t, emb, s):
    u = x / (1.0 + 0.25 * x * x)
    out = C1 * x + C2 * u + C3 * (t.astype(jnp.float32) / 1000.0)
    if emb is not None:
        g = emb[:, 0, 4]
        v = emb[:, 0, :4]
        out = out + C4 * g[:, None, None, None] + C5 * v[:, None, None, :]
    w = jnp.asarray(
        (1.0 / (np.arange(x.shape[0]) + 2.0)).astype(np.float32)
    )
    couple = (w[:, None, None, None] * x).sum(0)
    return out + (s * CC) * couple[None]


def jax_unet_plain(params, lat, t, emb):
    return stub_eps_jnp(lat, t, emb, jnp.float32(0.0))


def make_jax_unet(method: str, use_emb: bool = True):
    def f(params, lat, t, emb, ecfg=None, st=None, extra=None):
        s = st.context_guidance if method == "tca" else st.share_gate
        return stub_eps_jnp(lat, t, emb if use_emb else None, s)

    return f


def make_pipe(refmod, schedule):
    """Reference pipeline skeleton over the stub models."""
    p = refmod.FreeFinePipeline.__new__(refmod.FreeFinePipeline)
    sched = types.SimpleNamespace(
        config=types.SimpleNamespace(num_train_timesteps=1000),
        num_inference_steps=NUM,
        alphas_cumprod=torch.from_numpy(np.asarray(schedule.alphas_cumprod)),
        final_alpha_cumprod=torch.tensor(float(schedule.final_alpha_cumprod)),
        timesteps=torch.from_numpy(np.asarray(schedule.timesteps)),
        set_timesteps=lambda n: None,
    )
    object.__setattr__(p, "scheduler", sched)
    object.__setattr__(p, "device", torch.device("cpu"))

    ctrl = types.SimpleNamespace(
        reset=lambda: None,
        use_tca=False,
        use_style_align=False,
        method=None,
        context_guidance=0.0,
        log_mask=False,
    )
    object.__setattr__(p, "controller", ctrl)

    # tokenizer / text-encoder: prompt table shared with emb_of()
    registry: list = []

    def tok(prompts, padding=None, max_length=77, return_tensors=None):
        if isinstance(prompts, str):  # real tokenizers accept a bare string
            prompts = [prompts]
        ids = []
        for pr in prompts:
            if pr not in registry:
                registry.append(pr)
            ids.append([registry.index(pr)] * 77)
        return types.SimpleNamespace(input_ids=torch.tensor(ids))

    def enc(ids):
        rows = np.stack([emb_of(registry[int(r[0])]) for r in ids])
        return [torch.from_numpy(rows)]

    object.__setattr__(p, "tokenizer", tok)
    object.__setattr__(p, "text_encoder", enc)
    object.__setattr__(
        p,
        "vae",
        types.SimpleNamespace(
            decode=lambda z: {"sample": z}, dtype=torch.float32
        ),
    )

    def unet(x, t, encoder_hidden_states=None):
        if getattr(ctrl, "method", None) == "tca" and ctrl.use_tca:
            s = float(ctrl.context_guidance)
        elif getattr(ctrl, "use_tca", False):
            s = 1.0
        else:
            s = 0.0
        xn = np.ascontiguousarray(
            x.detach().float().numpy().transpose(0, 2, 3, 1)
        )
        e = encoder_hidden_states
        en = (
            e.detach().float().numpy()
            if e is not None and e.shape[0] == x.shape[0]
            else None
        )
        eps = stub_eps_np(xn, float(t), en, s)
        return torch.from_numpy(np.ascontiguousarray(eps.transpose(0, 3, 1, 2)))

    object.__setattr__(p, "unet", unet)
    return p


def noise_chain(seed: int, k: int, shape) -> list:
    """The exact noises our scans draw: carried-key split chain."""
    key = jax.random.key(seed)
    out = []
    for _ in range(k):
        key, sub = jax.random.split(key)
        out.append(np.asarray(jax.random.normal(sub, shape, jnp.float32)))
    return out


def queue_noises(noises_nhwc: list):
    _NOISE_Q.clear()
    for n in noises_nhwc:
        _NOISE_Q.append(np.ascontiguousarray(n.transpose(0, 3, 1, 2)))


def nchw(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a.transpose(0, 3, 1, 2))


def nhwc(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a.transpose(0, 2, 3, 1))


def rand_traj(seed: int, k: int, streams: int) -> np.ndarray:
    """[K+1, streams, lh, lw, 4] random 'inversion trajectory' (NHWC)."""
    rng = np.random.RandomState(seed)
    return (rng.randn(k + 1, streams, LH, LW, 4) * 0.3).astype(np.float32)


def rand_mask2d(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    m = np.zeros((LH, LW), np.float32)
    y0, x0 = rng.randint(0, LH // 2, 2)
    m[y0 : y0 + rng.randint(3, LH - y0), x0 : x0 + rng.randint(3, LW - x0)] = 1
    return m


GRID = [
    # (start_step, end_step, end_scale, eta, method_type)
    (3, 10, 0.0, 1.0, "tca"),     # GeoBench 2D protocol shape
    (3, 6, 0.5, 1.0, "tca"),
    (7, 10, 0.0, 1.0, "tca"),     # 3D protocol shape (late start)
    (3, 6, 0.5, 0.0, "tca"),      # pure-DDIM
    (3, 6, 0.5, 1.0, "mmsa"),
    (3, 6, 0.5, 1.0, "mmsa_es"),  # mid-loop use_tca flip
    (1, 10, 0.0, 1.0, "tca"),     # bggen protocol shape (start 1)
]


# ---------------------------------------------------------------------------
# invert
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("streams,start", [(2, 3), (1, 1), (3, 7)])
def test_invert_golden(refmod, schedule, streams, start):
    """Reference invert (model.py:817-925, guidance 1.0 as all entry points
    use, model.py:1357) vs ddim_invert_loop: full trajectory."""
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    lat0 = rand_traj(100 + streams, 0, streams)[0]  # [streams, lh, lw, 4]
    pipe.image2latent = lambda image: torch.from_numpy(nchw(lat0))

    image = torch.zeros(streams, 3, 8, 8)
    _, want_list = pipe.invert(
        image,
        "",
        num_inference_steps=NUM,
        num_actual_inference_steps=k,
        guidance_scale=1.0,
        return_intermediates=True,
        verbose=False,
    )

    emb = jnp.asarray(np.stack([emb_of("")] * streams))
    got = ddim_invert_loop(
        jax_unet_plain, None, schedule, jnp.asarray(lat0), emb, k
    )
    assert len(want_list) == k + 1 == got.shape[0]
    for j, wl in enumerate(want_list):
        np.testing.assert_allclose(
            np.asarray(got[j]), nhwc(wl.numpy()), atol=1e-5,
            err_msg=f"inversion step {j}",
        )


# ---------------------------------------------------------------------------
# forward_sampling (edit)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("start,end,end_scale,eta,method", GRID)
def test_forward_sampling_golden(
    refmod, schedule, start, end, end_scale, eta, method
):
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    traj = rand_traj(7 * start + end, k, 2)
    cfg_mask = rand_mask2d(start + 1)
    var_mask = rand_mask2d(start + 2)
    prompt = "a red fox"

    noises = noise_chain(1000 + start * 10 + end, k, (2, LH, LW, 4))
    queue_noises(noises if eta > 0 else [])

    refer = [torch.from_numpy(nchw(x)) for x in traj[::-1]]
    _, want_list = pipe.forward_sampling(
        prompt=[prompt, ""],
        refer_latents=refer,
        batch_size=2,
        end_step=end,
        num_inference_steps=NUM,
        num_actual_inference_steps=k,
        guidance_scale=GS,
        latents=torch.from_numpy(nchw(traj[-1])).clone(),
        eta=eta,
        end_scale=end_scale,
        local_var_reg=torch.from_numpy(var_mask),
        completion_mask_cfg=torch.from_numpy(cfg_mask),
        share_attn=True,
        method_type=method,
        verbose=True,
        local_perturbation=True,
        return_intermediates=True,
    )
    assert not _NOISE_Q, "torch loop drew fewer noises than queued"

    mname, cg, gates = _method_and_gates(method, start, end, NUM, end_scale)
    ecfg = EditConfig(mode="edit", method=mname, num_streams=4)
    emb4 = jnp.asarray(
        np.stack([emb_of(""), emb_of(""), emb_of(prompt), emb_of("")])
    )
    got, inter = sample_edit_loop(
        make_jax_unet(mname), None, schedule, ecfg,
        jnp.asarray(traj), emb4, EditState(),
        jnp.asarray(cg), jnp.asarray(gates),
        jnp.asarray(cfg_mask), jnp.asarray(var_mask),
        jax.random.key(1000 + start * 10 + end),
        start_step=start, guidance_scale=GS, eta=eta,
        local_text_edit=True, local_perturbation=True,
        return_intermediates=True,
    )

    # latents_list[0] is the initial latents; entries 1..K the stepped
    # 2-stream latents (model.py:573,618).  Our intermediates carry the
    # edit stream; the final carry has both streams.
    assert len(want_list) == k + 1
    for j in range(k):
        np.testing.assert_allclose(
            np.asarray(inter[j]), nhwc(want_list[j + 1].numpy())[0],
            atol=1e-5, err_msg=f"edit step {j}",
        )
    np.testing.assert_allclose(
        np.asarray(got), nhwc(want_list[-1].numpy()), atol=1e-5
    )


# ---------------------------------------------------------------------------
# forward_sampling_background_gen
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("start,end,end_scale,eta,method", GRID)
def test_forward_sampling_bggen_golden(
    refmod, schedule, start, end, end_scale, eta, method
):
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    traj = rand_traj(9 * start + end, k, 1)
    var_mask = rand_mask2d(start + 5)
    prompt = "empty city street"

    noises = noise_chain(2000 + start * 10 + end, k, (2, LH, LW, 4))
    queue_noises(noises if eta > 0 else [])

    refer = [torch.from_numpy(nchw(x)) for x in traj[::-1]]
    _, want_list = pipe.forward_sampling_background_gen(
        prompt=[prompt, ""],
        refer_latents=refer,
        batch_size=2,
        end_step=end,
        num_inference_steps=NUM,
        num_actual_inference_steps=k,
        guidance_scale=3.5,
        latents=torch.from_numpy(nchw(traj[-1])).clone(),
        eta=eta,
        end_scale=end_scale,
        local_var_reg=torch.from_numpy(var_mask),
        local_cfg_reg=torch.from_numpy(var_mask),
        share_attn=True,
        method_type=method,
        verbose=True,
        local_text_edit=True,
        local_perturbation=True,
        return_intermediates=True,
    )
    assert not _NOISE_Q

    mname, cg, gates = _method_and_gates(method, start, end, NUM, end_scale)
    ecfg = EditConfig(mode="bggen", method=mname, num_streams=4)
    emb4 = jnp.asarray(
        np.stack([emb_of(""), emb_of(""), emb_of(prompt), emb_of("")])
    )
    got, inter = sample_bggen_loop(
        make_jax_unet(mname), None, schedule, ecfg,
        jnp.asarray(traj), emb4, EditState(),
        jnp.asarray(cg), jnp.asarray(gates),
        jnp.asarray(var_mask), jnp.asarray(var_mask),
        jax.random.key(2000 + start * 10 + end),
        start_step=start, guidance_scale=3.5, eta=eta,
        local_text_edit=True, local_perturbation=True,
        return_intermediates=True,
    )

    # latents_list entries 1..K are the stepped generated-stream latents
    # (model.py:808); ours mirror them 1:1.
    assert len(want_list) == k + 1
    for j in range(k):
        np.testing.assert_allclose(
            np.asarray(inter[j]), nhwc(want_list[j + 1].numpy()[None])[0],
            atol=1e-5, err_msg=f"bggen step {j}",
        )
    np.testing.assert_allclose(
        np.asarray(got), nhwc(want_list[-1].numpy()[None]), atol=1e-5
    )


# ---------------------------------------------------------------------------
# forward_sampling_compose
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 3])
@pytest.mark.parametrize("start,end,end_scale,eta,method", GRID[:4])
def test_forward_sampling_compose_golden(
    refmod, schedule, n, start, end, end_scale, eta, method
):
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    traj = rand_traj(11 * start + end + n, k, n + 1)
    cfg_mask = rand_mask2d(start + 3)
    var_mask = rand_mask2d(start + 4)
    prompts = [f"object {i}" for i in range(n)]

    noises = noise_chain(3000 + start * 10 + n, k, (1, LH, LW, 4))
    queue_noises(noises if eta > 0 else [])

    refer = [torch.from_numpy(nchw(x)) for x in traj[::-1]]
    _, want_list = pipe.forward_sampling_compose(
        prompt=list(prompts),
        refer_latents=refer,
        batch_size=n + 1,
        end_step=end,
        num_inference_steps=NUM,
        num_actual_inference_steps=k,
        guidance_scale=GS,
        latents=torch.from_numpy(nchw(traj[-1])).clone(),
        eta=eta,
        end_scale=end_scale,
        local_var_reg=torch.from_numpy(var_mask),
        cfg_masks_tensor=torch.from_numpy(cfg_mask),
        share_attn=True,
        method_type=method,
        verbose=True,
        local_edit_text=True,
        local_perturbation=True,
        return_intermediates=True,
    )
    assert not _NOISE_Q

    mname, cg, gates = _method_and_gates(method, start, end, NUM, end_scale)
    ecfg = EditConfig(
        mode="compose", method=mname, num_sources=n, num_streams=n + 2,
        prompt_length=len(prompts) + 1,
    )
    ctx = jnp.zeros((n + 2, 77, EMB_D), jnp.float32)   # stub ignores text
    extra = jnp.zeros((2, 77, EMB_D), jnp.float32)
    got, inter = sample_compose_loop(
        make_jax_unet(mname, use_emb=False), None, schedule, ecfg,
        jnp.asarray(traj), ctx, extra, EditState(),
        jnp.asarray(cg), jnp.asarray(gates),
        jnp.asarray(cfg_mask), jnp.asarray(var_mask),
        jax.random.key(3000 + start * 10 + n),
        start_step=start, guidance_scale=GS, eta=eta,
        local_text_edit=True, local_perturbation=True,
        return_intermediates=True,
    )

    assert len(want_list) == k + 1
    for j in range(k):
        np.testing.assert_allclose(
            np.asarray(inter[j]), nhwc(want_list[j + 1].numpy()[None])[0],
            atol=1e-5, err_msg=f"compose step {j}",
        )
    np.testing.assert_allclose(
        np.asarray(got), nhwc(want_list[-1].numpy()[None]), atol=1e-5
    )


# ---------------------------------------------------------------------------
# full entry points (inversion glue + mask prep + loop + decode math)
# ---------------------------------------------------------------------------


def encode_img_np(img_nchw: np.ndarray) -> np.ndarray:
    """Deterministic stand-in 'VAE encode': [B,3,96,96] f32 in [-1,1]
    -> [B,4,12,12] (8x8 average pool + mean channel).  Shared verbatim by
    both sides (the real VAE bridge is pinned in test_weights.py)."""
    b, c, h, w = img_nchw.shape
    pooled = img_nchw.reshape(b, c, LH, h // LH, LW, w // LW).mean(axis=(3, 5))
    extra = pooled.mean(axis=1, keepdims=True)
    return np.concatenate([pooled, extra], axis=1).astype(np.float32)


def prep_img_np(img_u8: np.ndarray) -> np.ndarray:
    """reference preprocess_image (model.py:1282-1288) in numpy."""
    x = img_u8.astype(np.float32) / 127.5 - 1.0
    return np.ascontiguousarray(x.transpose(2, 0, 1))[None]


def decode_to_uint8(lat_hwc: np.ndarray) -> np.ndarray:
    """reference latent2image with the identity-decode VAE stub +
    Details_Preserving's uint8 cast (model.py:269-280,1698-1700)."""
    img = np.clip(lat_hwc / 0.18215 / 2.0 + 0.5, 0.0, 1.0) * 255.0
    return img.astype(np.uint8)


def rand_img(seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, 256, (H, W, 3), dtype=np.uint8
    )


def rand_blob_u8(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    m = np.zeros((H, W), np.uint8)
    y0 = rng.randint(0, H // 2)
    x0 = rng.randint(0, W // 2)
    m[y0 : y0 + rng.randint(20, H - y0), x0 : x0 + rng.randint(20, W - x0)] = 1
    return m


@pytest.mark.parametrize("use_auto_draw,reduce_inp", [(True, True), (False, False)])
def test_full_entry_generation_golden(refmod, schedule, use_auto_draw, reduce_inp):
    """FreeFine_generation (model.py:1012-1049) end-to-end: inversion glue
    (DDIM_inversion_func stream stacking, :1342-1364), prepare_various_mask,
    forward_sampling, and the uint8 decode — vs our chained components."""
    start, end, end_scale, eta = 3, NUM, 0.0, 1.0  # GeoBench 2D protocol
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    pipe.image2latent = lambda image: torch.from_numpy(
        encode_img_np(image.detach().float().numpy())
    )

    ori_img, coarse = rand_img(21), rand_img(22)
    ori_mask, tgt_mask = rand_blob_u8(23), rand_blob_u8(24)
    draw = None if use_auto_draw else rand_blob_u8(25)
    cons = np.clip(rand_blob_u8(26) + ori_mask, 0, 1).astype(np.uint8)
    prompt = "a cat on grass"

    noises = noise_chain(4242, k, (2, LH, LW, 4))
    queue_noises(noises)

    want = pipe.FreeFine_generation(
        ori_img, ori_mask, coarse, tgt_mask, prompt,
        guidance_scale=GS, eta=eta, end_step=end, num_step=NUM,
        start_step=start, method_type="tca", verbose=True,
        draw_mask=draw, use_auto_draw=use_auto_draw, cons_area=cons,
        reduce_inp_artifacts=reduce_inp, end_scale=end_scale, seed=42,
    )
    assert not _NOISE_Q

    # ours: same chain through our production components
    lat0 = nhwc(encode_img_np(
        np.concatenate([prep_img_np(coarse), prep_img_np(ori_img)], 0)
    ))
    emb2 = jnp.asarray(np.stack([emb_of("")] * 2))
    traj = ddim_invert_loop(
        jax_unet_plain, None, schedule, jnp.asarray(lat0), emb2, k
    )
    em = M.prepare_various_mask(
        jnp.asarray(tgt_mask), jnp.asarray(ori_mask),
        None if draw is None else jnp.asarray(draw),
        H, W, LH, LW,
        use_auto_draw=use_auto_draw, cons_area=jnp.asarray(cons),
        reduce_inp_artifacts=reduce_inp,
    )
    mname, cg, gates = _method_and_gates("tca", start, end, NUM, end_scale)
    ecfg = EditConfig(mode="edit", method=mname, num_streams=4)
    emb4 = jnp.asarray(
        np.stack([emb_of(""), emb_of(""), emb_of(prompt), emb_of("")])
    )
    got = sample_edit_loop(
        make_jax_unet(mname), None, schedule, ecfg,
        traj, emb4, EditState(), jnp.asarray(cg), jnp.asarray(gates),
        em.completion_cfg, em.local_var, jax.random.key(4242),
        start_step=start, guidance_scale=GS, eta=eta,
        local_text_edit=True, local_perturbation=True,
    )
    got_img = decode_to_uint8(np.asarray(got[0]))
    assert want.shape == got_img.shape
    np.testing.assert_array_less(
        np.abs(want.astype(np.int32) - got_img.astype(np.int32)).max(), 2
    )


def test_full_entry_background_generation_golden(refmod, schedule):
    """FreeFine_background_generation (model.py:1088-1120) end-to-end."""
    start, end, end_scale, eta = 1, NUM, 0.0, 1.0
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    pipe.image2latent = lambda image: torch.from_numpy(
        encode_img_np(image.detach().float().numpy())
    )

    ori_img = rand_img(31)
    ori_mask = rand_blob_u8(32)
    prompt = "empty scene"

    noises = noise_chain(5151, k, (2, LH, LW, 4))
    queue_noises(noises)

    want = pipe.FreeFine_background_generation(
        ori_img, ori_mask, prompt,
        guidance_scale=3.5, eta=eta, end_step=end, num_step=NUM,
        start_step=start, method_type="tca", verbose=True,
        end_scale=end_scale, seed=42,
    )
    assert not _NOISE_Q

    lat0 = nhwc(encode_img_np(prep_img_np(ori_img)))
    emb1 = jnp.asarray(emb_of("")[None])
    traj = ddim_invert_loop(
        jax_unet_plain, None, schedule, jnp.asarray(lat0), emb1, k
    )
    _, local_var = M.prepare_mask_bggen(jnp.asarray(ori_mask), H, W, LH, LW)
    mname, cg, gates = _method_and_gates("tca", start, end, NUM, end_scale)
    ecfg = EditConfig(mode="bggen", method=mname, num_streams=4)
    emb4 = jnp.asarray(
        np.stack([emb_of(""), emb_of(""), emb_of(prompt), emb_of("")])
    )
    got = sample_bggen_loop(
        make_jax_unet(mname), None, schedule, ecfg,
        traj, emb4, EditState(), jnp.asarray(cg), jnp.asarray(gates),
        local_var, local_var, jax.random.key(5151),
        start_step=start, guidance_scale=3.5, eta=eta,
        local_text_edit=True, local_perturbation=True,
    )
    got_img = decode_to_uint8(np.asarray(got[0]))
    assert want.shape == got_img.shape
    np.testing.assert_array_less(
        np.abs(want.astype(np.int32) - got_img.astype(np.int32)).max(), 2
    )


@pytest.mark.parametrize("appearance", [False, True])
def test_full_entry_composition_golden(refmod, schedule, appearance):
    """FreeFine_cross_image_composition (model.py:1051-1086) end-to-end with
    N=2 sources, appearance_transfer both ways: DDIM_inversion_func_compose
    stream order (:1366-1388), prepare_composition_masks wiring (incl. the
    appearance-transfer mask branch feeding local_var/completion_cfg into
    the loop), forward_sampling_compose, decode.

    NOTE — reference bug, pinned below: the entry itself is unrunnable as
    written.  FreeFine_cross_image_composition forwards
    ``use_auto_draw=use_auto_draw`` (model.py:1082) to
    Details_Preserving_regeneration_compose (:1701-1706), whose signature
    has no such parameter and no **kwargs, so EVERY call raises TypeError.
    We therefore drive the two functions the entry composes —
    DDIM_inversion_func_compose + Details_Preserving_regeneration_compose —
    directly, replicating the entry's only other work (mask_reduce_dim,
    :1060-1061) inline; the crash itself is asserted as the golden pin of
    the entry.  Our `FreeFine.cross_image_composition` implements the
    documented intent (see PARITY.md)."""
    start, end, end_scale, eta = 3, 6, 0.5, 1.0
    k = NUM - start
    n = 2
    pipe = make_pipe(refmod, schedule)
    pipe.image2latent = lambda image: torch.from_numpy(
        encode_img_np(image.detach().float().numpy())
    )

    imgs = [rand_img(41), rand_img(42)]
    coarse = rand_img(43)
    ori_masks = [rand_blob_u8(44), rand_blob_u8(45)]
    tgt_masks = [rand_blob_u8(46), rand_blob_u8(47)]
    prompts = ["bird", "branch"]

    noises = noise_chain(6261 + int(appearance), k, (1, LH, LW, 4))
    queue_noises(noises)

    # The entry point itself always crashes (see docstring) — pin that:
    with pytest.raises(TypeError, match="use_auto_draw"):
        pipe.FreeFine_cross_image_composition(
            [im.copy() for im in imgs],
            [m.copy() for m in ori_masks],
            [m.copy() for m in tgt_masks],
            coarse, list(prompts),
            guidance_scale=GS, eta=eta, end_step=end, num_step=NUM,
            start_step=start, method_type="tca", verbose=True,
            end_scale=end_scale, seed=42, appearance_transfer=appearance,
        )
    _NOISE_Q.clear()
    queue_noises(noises)

    # ... and drive its body directly (entry minus the broken kwarg).
    inverted = pipe.DDIM_inversion_func_compose(
        img=coarse, compose_imgs=[im.copy() for im in imgs], prompt="",
        num_step=NUM, start_step=start, verbose=True,
    )
    want, _ = pipe.Details_Preserving_regeneration_compose(
        coarse, inverted, list(prompts),
        [m.copy() for m in ori_masks], [m.copy() for m in tgt_masks], None,
        num_steps=NUM, start_step=start, end_step=end,
        guidance_scale=GS, eta=eta, share_attn=True, method_type="tca",
        verbose=True, local_text_edit=True, local_perturbation=True,
        return_intermediates=False, end_scale=end_scale,
        appearance_transfer=appearance,
    )
    assert not _NOISE_Q

    lat0 = nhwc(encode_img_np(np.concatenate(
        [prep_img_np(coarse)] + [prep_img_np(im) for im in imgs], 0
    )))
    emb3 = jnp.asarray(np.stack([emb_of("")] * (n + 1)))
    traj = ddim_invert_loop(
        jax_unet_plain, None, schedule, jnp.asarray(lat0), emb3, k
    )
    cm = M.prepare_composition_masks(
        [jnp.asarray(m) for m in ori_masks],
        [jnp.asarray(m) for m in tgt_masks],
        H, W, LH, LW, appearance_transfer=appearance,
    )
    mname, cg, gates = _method_and_gates("tca", start, end, NUM, end_scale)
    ecfg = EditConfig(
        mode="compose", method=mname, num_sources=n, num_streams=n + 2,
        prompt_length=len(prompts) + 1,
    )
    ctx = jnp.zeros((n + 2, 77, EMB_D), jnp.float32)
    extra = jnp.zeros((2, 77, EMB_D), jnp.float32)
    got = sample_compose_loop(
        make_jax_unet(mname, use_emb=False), None, schedule, ecfg,
        traj, ctx, extra, EditState(), jnp.asarray(cg), jnp.asarray(gates),
        cm.completion_cfg, cm.local_var,
        jax.random.key(6261 + int(appearance)),
        start_step=start, guidance_scale=GS, eta=eta,
        local_text_edit=True, local_perturbation=True,
    )
    got_img = decode_to_uint8(np.asarray(got[0]))
    assert want.shape == got_img.shape
    np.testing.assert_array_less(
        np.abs(want.astype(np.int32) - got_img.astype(np.int32)).max(), 2
    )


@pytest.mark.parametrize("local_text,local_pert", [(False, True), (True, False)])
def test_forward_sampling_bggen_global_branches_golden(
    refmod, schedule, local_text, local_pert
):
    """The non-default CFG/perturbation branches: global text guidance
    (local_text_edit=False, model.py:781-782) and full-mask ctrl_step
    (local_perturbation=False, :789-790).  (forward_sampling proper cannot
    reach local_edit_text=False — its caller passes the value under the
    swallowed `blending` kwarg, model.py:1692 — so the edit task is pinned
    on its real, always-local path only.)"""
    start, end, end_scale, eta, method = 3, 6, 0.5, 1.0, "tca"
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    traj = rand_traj(71, k, 1)
    var_mask = rand_mask2d(9)

    noises = noise_chain(7100 + int(local_text), k, (2, LH, LW, 4))
    queue_noises(noises)

    refer = [torch.from_numpy(nchw(x)) for x in traj[::-1]]
    _, want_list = pipe.forward_sampling_background_gen(
        prompt=["empty", ""], refer_latents=refer, batch_size=2,
        end_step=end, num_inference_steps=NUM,
        num_actual_inference_steps=k, guidance_scale=3.5,
        latents=torch.from_numpy(nchw(traj[-1])).clone(), eta=eta,
        end_scale=end_scale, local_var_reg=torch.from_numpy(var_mask),
        local_cfg_reg=torch.from_numpy(var_mask), share_attn=True,
        method_type=method, verbose=True, local_text_edit=local_text,
        local_perturbation=local_pert, return_intermediates=True,
    )
    assert not _NOISE_Q

    mname, cg, gates = _method_and_gates(method, start, end, NUM, end_scale)
    ecfg = EditConfig(mode="bggen", method=mname, num_streams=4)
    emb4 = jnp.asarray(
        np.stack([emb_of(""), emb_of(""), emb_of("empty"), emb_of("")])
    )
    got, inter = sample_bggen_loop(
        make_jax_unet(mname), None, schedule, ecfg,
        jnp.asarray(traj), emb4, EditState(),
        jnp.asarray(cg), jnp.asarray(gates),
        jnp.asarray(var_mask), jnp.asarray(var_mask),
        jax.random.key(7100 + int(local_text)),
        start_step=start, guidance_scale=3.5, eta=eta,
        local_text_edit=local_text, local_perturbation=local_pert,
        return_intermediates=True,
    )
    for j in range(k):
        np.testing.assert_allclose(
            np.asarray(inter[j]), nhwc(want_list[j + 1].numpy()[None])[0],
            atol=1e-5, err_msg=f"bggen step {j}",
        )
    np.testing.assert_allclose(
        np.asarray(got), nhwc(want_list[-1].numpy()[None]), atol=1e-5
    )


@pytest.mark.parametrize("local_text,local_pert", [(False, True), (True, False)])
def test_forward_sampling_compose_global_branches_golden(
    refmod, schedule, local_text, local_pert
):
    """Compose's non-default branches: global text guidance
    (local_edit_text=False, model.py:420-421) and full-mask ctrl_step
    (local_perturbation=False, :427-428)."""
    start, end, end_scale, eta, method, n = 3, 6, 0.5, 1.0, "tca", 2
    k = NUM - start
    pipe = make_pipe(refmod, schedule)
    traj = rand_traj(72, k, n + 1)
    cfg_mask = rand_mask2d(10)
    var_mask = rand_mask2d(11)

    noises = noise_chain(7200 + int(local_text), k, (1, LH, LW, 4))
    queue_noises(noises)

    refer = [torch.from_numpy(nchw(x)) for x in traj[::-1]]
    _, want_list = pipe.forward_sampling_compose(
        prompt=["a", "b"], refer_latents=refer, batch_size=n + 1,
        end_step=end, num_inference_steps=NUM,
        num_actual_inference_steps=k, guidance_scale=GS,
        latents=torch.from_numpy(nchw(traj[-1])).clone(), eta=eta,
        end_scale=end_scale, local_var_reg=torch.from_numpy(var_mask),
        cfg_masks_tensor=torch.from_numpy(cfg_mask), share_attn=True,
        method_type=method, verbose=True, local_edit_text=local_text,
        local_perturbation=local_pert, return_intermediates=True,
    )
    assert not _NOISE_Q

    mname, cg, gates = _method_and_gates(method, start, end, NUM, end_scale)
    ecfg = EditConfig(
        mode="compose", method=mname, num_sources=n, num_streams=n + 2,
        prompt_length=3,
    )
    ctx = jnp.zeros((n + 2, 77, EMB_D), jnp.float32)
    extra = jnp.zeros((2, 77, EMB_D), jnp.float32)
    got, inter = sample_compose_loop(
        make_jax_unet(mname, use_emb=False), None, schedule, ecfg,
        jnp.asarray(traj), ctx, extra, EditState(),
        jnp.asarray(cg), jnp.asarray(gates),
        jnp.asarray(cfg_mask), jnp.asarray(var_mask),
        jax.random.key(7200 + int(local_text)),
        start_step=start, guidance_scale=GS, eta=eta,
        local_text_edit=local_text, local_perturbation=local_pert,
        return_intermediates=True,
    )
    for j in range(k):
        np.testing.assert_allclose(
            np.asarray(inter[j]), nhwc(want_list[j + 1].numpy()[None])[0],
            atol=1e-5, err_msg=f"compose step {j}",
        )
    np.testing.assert_allclose(
        np.asarray(got), nhwc(want_list[-1].numpy()[None]), atol=1e-5
    )


@pytest.mark.parametrize("rate", [0.5, 0.25])
def test_prepare_surrounding_mask_golden(refmod, schedule, rate):
    """reference prepare_surrounding_mask (model.py:1392-1426; defined but
    never called — kept for API completeness) vs masks.prepare_surrounding_mask
    on identical inputs."""
    pipe = make_pipe(refmod, schedule)
    rng = np.random.RandomState(3)
    m = np.zeros((40, 36), np.float32)
    m[10:22, 8:20] = 1.0
    cons = (rng.rand(40, 36) > 0.7).astype(np.float32)
    want = pipe.prepare_surrounding_mask(
        torch.from_numpy(m.copy()), torch.from_numpy(cons), rate=rate
    ).numpy()
    got = np.asarray(M.prepare_surrounding_mask(
        jnp.asarray(m), jnp.asarray(cons), rate=rate
    ))
    np.testing.assert_allclose(got, want, atol=1e-6)
