"""Numeric tests of DDIM schedule math against closed-form references.

The reference repo has no unit tests for inv_step/ctrl_step (SURVEY.md §4);
these lock down the exact alpha-cumprod indexing quirks documented in
schedulers/ddim.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.schedulers.ddim import (
    DDIMSchedule,
    context_guidance_schedule,
    ctrl_step,
    inv_step,
    linear_context_guidance,
)


def ref_alphas_cumprod():
    betas = (
        np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    )
    return np.cumprod(1.0 - betas)


class TestSchedule:
    def test_timesteps_sd15(self):
        s = DDIMSchedule.create(num_inference_steps=50)
        ts = np.asarray(s.timesteps)
        assert ts[0] == 981 and ts[-1] == 1
        assert len(ts) == 50
        assert np.all(np.diff(ts) == -20)

    def test_alphas_match_scaled_linear(self):
        s = DDIMSchedule.create()
        ref = ref_alphas_cumprod()
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ref, rtol=1e-5)
        # set_alpha_to_one=False => final = alphas_cumprod[0]
        assert float(s.final_alpha_cumprod) == pytest.approx(float(ref[0]), rel=1e-6)

    def test_alpha_at_negative_uses_final(self):
        s = DDIMSchedule.create()
        assert float(s.alpha_at(jnp.asarray(-19))) == pytest.approx(
            float(s.final_alpha_cumprod)
        )

    def test_alpha_prev_strict_zero_uses_final(self):
        # ctrl_step quirk: prev_timestep == 0 uses final_alpha_cumprod
        # (strict > 0 test), unlike _get_variance's >= 0.
        s = DDIMSchedule.create()
        assert float(s.alpha_prev_strict(jnp.asarray(0))) == pytest.approx(
            float(s.final_alpha_cumprod)
        )
        ref = ref_alphas_cumprod()
        assert float(s.alpha_prev_strict(jnp.asarray(1))) == pytest.approx(
            float(ref[1]), rel=1e-6
        )

    def test_variance_closed_form(self):
        s = DDIMSchedule.create(num_inference_steps=50)
        ref = ref_alphas_cumprod()
        t, tp = 981, 961
        a_t, a_p = ref[t], ref[tp]
        expected = ((1 - a_p) / (1 - a_t)) * (1 - a_t / a_p)
        assert float(s.variance(jnp.asarray(t))) == pytest.approx(
            expected, rel=1e-5
        )


class TestInvStep:
    def test_closed_form(self, rng_np):
        s = DDIMSchedule.create(num_inference_steps=50)
        ref = ref_alphas_cumprod()
        x = jnp.asarray(rng_np.normal(size=(2, 8, 8, 4)), jnp.float32)
        eps = jnp.asarray(rng_np.normal(size=(2, 8, 8, 4)), jnp.float32)
        t = 41  # timestep - delta = 21 >= 0
        x_next, x0 = inv_step(s, eps, jnp.asarray(t), x)
        a_t, a_n = ref[21], ref[41]
        x0_ref = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
        xn_ref = np.sqrt(a_n) * x0_ref + np.sqrt(1 - a_n) * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(x_next), xn_ref, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(x0), x0_ref, rtol=2e-4, atol=2e-5)

    def test_first_step_uses_final_alpha(self, rng_np):
        # t=1 => t - 20 = -19 < 0 => alpha_prod_t = final_alpha_cumprod.
        s = DDIMSchedule.create(num_inference_steps=50)
        ref = ref_alphas_cumprod()
        x = jnp.asarray(rng_np.normal(size=(1, 4, 4, 4)), jnp.float32)
        eps = jnp.asarray(rng_np.normal(size=(1, 4, 4, 4)), jnp.float32)
        x_next, _ = inv_step(s, eps, jnp.asarray(1), x)
        a_t = ref[0]  # final_alpha_cumprod
        a_n = ref[1]
        x0_ref = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
        xn_ref = np.sqrt(a_n) * x0_ref + np.sqrt(1 - a_n) * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(x_next), xn_ref, rtol=2e-4, atol=2e-5)

    def test_invert_then_denoise_roundtrip(self, rng_np):
        # A pure-DDIM ctrl step (eta=0, mask ones) must undo inv_step when
        # the model output is held fixed.
        s = DDIMSchedule.create(num_inference_steps=50)
        x = jnp.asarray(rng_np.normal(size=(1, 8, 8, 4)), jnp.float32)
        eps = jnp.asarray(rng_np.normal(size=(1, 8, 8, 4)), jnp.float32)
        t = jnp.asarray(501)
        x_up, _ = inv_step(s, eps, t, x)
        # inv_step: x(t-20) -> x(t).  ctrl_step at timestep t goes back.
        x_down, _ = ctrl_step(s, eps, t, x_up, None, eta=0.0, rng=None)
        np.testing.assert_allclose(np.asarray(x_down), np.asarray(x), rtol=1e-3, atol=1e-4)


class TestCtrlStep:
    def test_pure_ddim_matches_closed_form(self, rng_np):
        s = DDIMSchedule.create(num_inference_steps=50)
        ref = ref_alphas_cumprod()
        x = jnp.asarray(rng_np.normal(size=(1, 8, 8, 4)), jnp.float32)
        eps = jnp.asarray(rng_np.normal(size=(1, 8, 8, 4)), jnp.float32)
        t = 981
        x_prev, x0 = ctrl_step(s, eps, jnp.asarray(t), x, None, eta=0.0, rng=None)
        a_t, a_p = ref[t], ref[t - 20]
        x0_ref = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
        xp_ref = np.sqrt(a_p) * x0_ref + np.sqrt(1 - a_p) * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(x_prev), xp_ref, rtol=2e-4, atol=2e-5)

    def test_masked_ddpm_region(self, rng_np):
        """Inside mask: DDPM coeff + noise; outside: plain DDIM."""
        s = DDIMSchedule.create(num_inference_steps=50)
        ref = ref_alphas_cumprod()
        H = W = 8
        mask = np.zeros((H, W), np.float32)
        mask[:4] = 1.0
        x = jnp.asarray(rng_np.normal(size=(1, H, W, 4)), jnp.float32)
        eps = jnp.asarray(rng_np.normal(size=(1, H, W, 4)), jnp.float32)
        t, eta = 501, 1.0
        key = jax.random.key(0)
        x_prev, _ = ctrl_step(
            s, eps, jnp.asarray(t), x, jnp.asarray(mask), eta=eta, rng=key
        )
        a_t, a_p = ref[t], ref[t - 20]
        var = ((1 - a_p) / (1 - a_t)) * (1 - a_t / a_p)
        std = eta * np.sqrt(var)
        x0_ref = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
        noise = np.asarray(jax.random.normal(key, x.shape, jnp.float32))
        m = mask[None, :, :, None]
        dir_ref = (
            np.sqrt(1 - a_p - std**2) * np.asarray(eps) * m
            + np.sqrt(1 - a_p) * np.asarray(eps) * (1 - m)
        )
        expected = np.sqrt(a_p) * x0_ref + dir_ref + std * noise * m
        np.testing.assert_allclose(np.asarray(x_prev), expected, rtol=2e-4, atol=2e-5)

    def test_reference_stream_pure_ddim(self, rng_np):
        """Streams >= ddim_streams_from ignore eta and the mask entirely."""
        s = DDIMSchedule.create(num_inference_steps=50)
        mask = np.ones((8, 8), np.float32)
        x = jnp.asarray(rng_np.normal(size=(2, 8, 8, 4)), jnp.float32)
        eps = jnp.asarray(rng_np.normal(size=(2, 8, 8, 4)), jnp.float32)
        t = jnp.asarray(501)
        key = jax.random.key(1)
        x_hybrid, _ = ctrl_step(
            s, eps, t, x, jnp.asarray(mask), eta=1.0, rng=key, ddim_streams_from=1
        )
        x_ddim, _ = ctrl_step(s, eps, t, x, None, eta=0.0, rng=None)
        # stream 1 (reference) identical to pure DDIM
        np.testing.assert_allclose(
            np.asarray(x_hybrid)[1], np.asarray(x_ddim)[1], rtol=1e-5, atol=1e-6
        )
        # stream 0 differs (noise added)
        assert not np.allclose(np.asarray(x_hybrid)[0], np.asarray(x_ddim)[0])

    def test_jit_scan_compatible(self):
        """ctrl_step must trace inside lax.scan over timesteps."""
        s = DDIMSchedule.create(num_inference_steps=10)
        x0 = jnp.zeros((1, 4, 4, 4), jnp.float32)

        def body(x, t):
            eps = jnp.ones_like(x) * 0.01
            x, _ = ctrl_step(s, eps, t, x, None, eta=0.0, rng=None)
            return x, ()

        out, _ = jax.jit(lambda x: jax.lax.scan(body, x, s.timesteps))(x0)
        assert np.all(np.isfinite(np.asarray(out)))


class TestContextGuidance:
    def test_matches_reference_piecewise(self):
        # Reference linear_param with t1=25, t0=10, t2=50, end_scale=0.5:
        # i > t0 branch: 0.5 - 0.5/40 * (i - 10)
        for i in [25, 30, 49]:
            v = float(linear_context_guidance(i, 25, 10, 50, 0.5))
            assert v == pytest.approx(0.5 - 0.5 / 40 * (i - 10), rel=1e-6)

    def test_first_segment(self):
        # end_step > start_step activates segment 1: 1 -> end_scale.
        v = float(linear_context_guidance(5, 0, 10, 50, 0.5))
        assert v == pytest.approx(1.0 + (0.5 - 1.0) / 10 * 5, rel=1e-6)

    def test_schedule_array(self):
        sched = context_guidance_schedule(25, 10, 50, 0.5)
        assert sched.shape == (50,)
        assert np.all(sched[:25] == 0)
        assert sched[25] == pytest.approx(0.5 - 0.5 / 40 * 15)
