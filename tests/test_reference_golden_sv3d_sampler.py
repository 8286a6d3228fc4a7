"""Golden test: our SV3D composed sampler vs the reference's OWN sgm code.

test_reference_golden_sv3d.py pins the VideoUNet forward at 5e-8; this file
pins the sampling *composition* around it — the pieces re_edit_3d.py:251-435
chains for the 21-frame orbit:

  * EDMDiscretization (discretizer.py:28-39)       -> sv3d.edm_sigmas
  * VScalingWithEDMcNoise (denoiser_scaling.py)    -> sv3d.v_scaling_edm_cnoise
  * TrianglePredictionGuider (guiders.py:102-131)  -> sv3d.triangle_guidance_scales
  * VanillaCFG (guiders.py:24-41)                  -> the scale-constant special case
  * Denoiser + OpenAIWrapper concat/context/vector routing (denoiser.py:12-39,
    wrappers.py)                                    -> SV3D.sample_latents' denoise()
  * EulerEDMSampler.__call__/sampler_step incl. the sqrt(1+sigma_0^2) init
    scaling (sampling.py:41-131)                   -> SV3D.sample_latents' scan

Method mirrors test_reference_golden_loops.py: a deterministic stub network
(same closed-form function in numpy for sgm's torch loop and jnp for our
scan — with frame coupling WITHIN each num_frames group, so u/c stream
routing and the concat-channel order are load-bearing) drives both sides;
the denoiser/guider/sampler on the torch side are the reference's real
classes instantiated through sgm's own instantiate_from_config.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from freefine_tpu.models.sv3d import (
    SV3D,
    build_sv3d_vector_cond,
    edm_sigmas,
    triangle_guidance_scales,
    v_scaling_edm_cnoise,
)
from tests.golden_stubs import make_module, override

SGM_ROOT = "/root/reference/generative-models"

T = 3          # frames
H = W = 8      # latent
STEPS = 5
ADM = 20
CTX_D = 16


@pytest.fixture(scope="module")
def sgm():
    stubs = {
        "pytorch_lightning": make_module(
            "pytorch_lightning", LightningModule=torch.nn.Module
        ),
        "omegaconf": make_module(
            "omegaconf", ListConfig=list, DictConfig=dict, OmegaConf=None
        ),
        "kornia": make_module("kornia"),
        "open_clip": make_module("open_clip"),
    }
    restore = override(stubs)
    sys.path.insert(0, SGM_ROOT)
    try:
        from sgm.modules.diffusionmodules import denoiser_scaling, guiders
        from sgm.modules.diffusionmodules.denoiser import Denoiser
        from sgm.modules.diffusionmodules.discretizer import EDMDiscretization
        from sgm.modules.diffusionmodules.sampling import EulerEDMSampler

        yield types.SimpleNamespace(
            Denoiser=Denoiser,
            EDMDiscretization=EDMDiscretization,
            EulerEDMSampler=EulerEDMSampler,
            guiders=guiders,
            scaling=denoiser_scaling,
        )
    finally:
        sys.path.remove(SGM_ROOT)
        restore()


# ---------------------------------------------------------------------------
# piece-level pins
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("smax", [700.0, 80.0, 10.0])
def test_edm_sigmas_match(sgm, smax):
    disc = sgm.EDMDiscretization(sigma_min=0.002, sigma_max=smax, rho=7.0)
    want = disc(STEPS, do_append_zero=True, device="cpu").numpy()
    got = np.asarray(edm_sigmas(STEPS, sigma_max=smax))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=0)


def test_v_scaling_matches(sgm):
    sc = sgm.scaling.VScalingWithEDMcNoise()
    sig = torch.tensor([700.0, 34.2, 1.0, 0.0021])
    w_skip, w_out, w_in, w_noise = sc(sig)
    g_skip, g_out, g_in, g_noise = v_scaling_edm_cnoise(jnp.asarray(sig.numpy()))
    np.testing.assert_allclose(np.asarray(g_skip), w_skip.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_out), w_out.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_in), w_in.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_noise), w_noise.numpy(), rtol=1e-6)


@pytest.mark.parametrize("nf,mx", [(21, 2.5), (3, 2.0), (8, 3.5)])
def test_triangle_guider_scales_match(sgm, nf, mx):
    g = sgm.guiders.TrianglePredictionGuider(max_scale=mx, num_frames=nf)
    want = g.scale[0].numpy()
    got = np.asarray(triangle_guidance_scales(nf, mx))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_vanilla_cfg_is_constant_scale_special_case(sgm):
    """VanillaCFG(s) == per-frame guidance with a constant scale table —
    the uniform-scale special case of our scales vector."""
    rng = np.random.RandomState(0)
    xu = rng.randn(T, 4, H, W).astype(np.float32)
    xc = rng.randn(T, 4, H, W).astype(np.float32)
    g = sgm.guiders.VanillaCFG(scale=2.0)
    want = g(
        torch.from_numpy(np.concatenate([xu, xc], 0)), torch.tensor(1.0)
    ).numpy()
    got = xu + 2.0 * (xc - xu)  # constant-scale vector path
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# composed sampler
# ---------------------------------------------------------------------------

# stub network eps = C1*x + C2*x/(1+0.25x^2) + C3*cn + C4*ctx[b,0,1]
#                  + C5*y[b,2] + CC * within-group frame coupling
C1, C2, C3, C4, C5, CC = 0.4, 0.15, 0.05, 0.04, 0.03, 0.06


def _frame_weights(t):
    return (1.0 / (np.arange(t) + 2.0)).astype(np.float32)


def stub_net_np(x, cn, ctx, y, t):
    """numpy stub; x [B, h, w, c] NHWC (c = 8: scaled latent + concat),
    cn [B], ctx [B, S, D], y [B, A].  B is a multiple of t; coupling mixes
    frames within each consecutive t-group only (like temporal attention),
    and emits 4 output channels from the 8 input channels."""
    u = x / (1.0 + 0.25 * x * x)
    h = C1 * x + C2 * u
    h = h[..., :4] + 0.3 * h[..., 4:]          # fold concat channels in
    h = h + C3 * cn[:, None, None, None]
    h = h + C4 * ctx[:, 0, 1][:, None, None, None]
    h = h + C5 * y[:, 2][:, None, None, None]
    b = x.shape[0]
    w = _frame_weights(t)
    g = h.reshape(b // t, t, *h.shape[1:])
    couple = (w[None, :, None, None, None] * g).sum(1, keepdims=True)
    g = g + CC * couple
    return g.reshape(b, *h.shape[1:])


def stub_net_jnp(x, cn, ctx, y, t):
    u = x / (1.0 + 0.25 * x * x)
    h = C1 * x + C2 * u
    h = h[..., :4] + 0.3 * h[..., 4:]
    h = h + C3 * cn[:, None, None, None]
    h = h + C4 * ctx[:, 0, 1][:, None, None, None]
    h = h + C5 * y[:, 2][:, None, None, None]
    b = x.shape[0]
    w = jnp.asarray(_frame_weights(t))
    g = h.reshape(b // t, t, *h.shape[1:])
    couple = (w[None, :, None, None, None] * g).sum(1, keepdims=True)
    g = g + CC * couple
    return g.reshape(b, *h.shape[1:])


class _StubUNet:
    """Quacks like freefine_tpu VideoUNet for SV3D.sample_latents."""

    config = types.SimpleNamespace(adm_in_channels=ADM)

    def apply(self, params, inp, t_cont, ctx, y):
        return stub_net_jnp(inp, t_cont, ctx, y, T)


@pytest.mark.parametrize("smax,max_guidance", [(700.0, 2.5), (10.0, 2.0)])
def test_composed_sampler_golden(sgm, smax, max_guidance):
    """Full orbit sampling: reference EulerEDMSampler + Denoiser(VScaling) +
    TrianglePredictionGuider over the stub network vs SV3D.sample_latents —
    incl. the guider's [uncond; cond] batch layout, OpenAIWrapper's
    concat-channel order, c_in/c_out/c_skip application, the
    sqrt(1+sigma_0^2) init scaling, and the Euler update."""
    rng_np = np.random.RandomState(int(smax))
    cond_latent = rng_np.randn(1, H, W, 4).astype(np.float32) * 0.2
    clip_tokens = rng_np.randn(1, 1, CTX_D).astype(np.float32)
    azim = [15.0, 120.0, 300.0]
    elev = [10.0, 10.0, 10.0]
    cond_aug = 1e-5

    # ours — through the public sampler
    model = SV3D(
        unet=_StubUNet(), unet_params=None, num_frames=T, num_steps=STEPS,
        sigma_max=smax, cond_aug=cond_aug,
    )
    key = jax.random.key(42)
    got = np.asarray(model.sample_latents(
        jnp.asarray(cond_latent), jnp.asarray(clip_tokens), azim, elev,
        key, max_guidance=max_guidance,
    ))

    # replicate sample_latents' rng chain to hand torch the same noises
    k = key
    k, sub = jax.random.split(k)
    cond_noise = np.asarray(jax.random.normal(sub, (T, H, W, 4)))
    k, sub = jax.random.split(k)
    init_noise = np.asarray(jax.random.normal(sub, (T, H, W, 4), jnp.float32))

    y = np.asarray(build_sv3d_vector_cond(
        cond_aug,
        np.pi / 2 - np.deg2rad(np.asarray(elev, np.float32)),
        np.deg2rad(np.asarray(azim, np.float32)),
        adm_in=ADM,
    ))
    cond_cat = np.tile(cond_latent, (T, 1, 1, 1)) + cond_aug * cond_noise

    def nchw(a):
        return np.ascontiguousarray(a.transpose(0, 3, 1, 2))

    c = {
        "crossattn": torch.from_numpy(np.tile(clip_tokens, (T, 1, 1))),
        "vector": torch.from_numpy(y),
        "concat": torch.from_numpy(nchw(cond_cat)),
    }
    uc = {
        "crossattn": torch.zeros_like(c["crossattn"]),
        "vector": torch.from_numpy(y),
        "concat": torch.zeros_like(c["concat"]),
    }

    def network(x_scaled, c_noise, cond, **kw):
        # OpenAIWrapper: cat concat channels, route crossattn/vector
        x = torch.cat([x_scaled, cond["concat"]], 1)
        out = stub_net_np(
            np.ascontiguousarray(
                x.detach().float().numpy().transpose(0, 2, 3, 1)
            ),
            c_noise.detach().float().numpy(),
            cond["crossattn"].detach().float().numpy(),
            cond["vector"].detach().float().numpy(),
            T,
        )
        return torch.from_numpy(nchw(out))

    denoiser_mod = sgm.Denoiser(scaling_config={
        "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
    })
    sampler = sgm.EulerEDMSampler(
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_min": 0.002, "sigma_max": smax, "rho": 7.0},
        },
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.TrianglePredictionGuider",
            "params": {"max_scale": max_guidance, "num_frames": T},
        },
        num_steps=STEPS,
        verbose=False,
        device="cpu",
    )
    den = lambda input, sigma, cond: denoiser_mod(network, input, sigma, cond)
    with torch.no_grad():
        want = sampler(den, torch.from_numpy(nchw(init_noise)), c, uc).numpy()

    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), rtol=1e-4, atol=5e-4
    )
