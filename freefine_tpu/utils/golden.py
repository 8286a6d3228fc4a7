"""Golden-dump comparison: replay a diffusers dump through the Flax models.

The dump half lives in scripts/validate_against_diffusers.py (runs where
diffusers exists); this check half is importable and unit-testable offline —
tests feed it synthetic dumps produced by the Flax models themselves, so the
whole protocol (layout conventions, tolerance logic, reporting) is verified
before a real checkpoint ever arrives.

Targets the "GeoBench within 1% of the PyTorch reference" half of
BASELINE.json: eps parity at one denoise step bounds the per-step drift of
the whole 50-step loop.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _metrics(ours: np.ndarray, ref: np.ndarray, atol_max: float,
             atol_mean: float) -> Dict:
    ours = np.asarray(ours, np.float32)
    ref = np.asarray(ref, np.float32)
    d = np.abs(ours - ref)
    return {
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "ok": bool(d.max() <= atol_max and d.mean() <= atol_mean),
    }


def compare_golden(
    pipe,
    golden,
    atol_max: float = 5e-2,
    atol_mean: float = 5e-3,
) -> Dict[str, Dict]:
    """Replay a golden npz (see validate_against_diffusers.dump) through
    `pipe`'s text encoder / UNet / VAE and report per-stage deltas.

    Each stage consumes the GOLDEN inputs (not upstream Flax outputs), so a
    failure localises to one converter instead of cascading.
    """
    import jax.numpy as jnp

    report: Dict[str, Dict] = {}

    # tokenizer (only when a real BPE tokenizer is loaded)
    from freefine_tpu.models.tokenizer import CLIPTokenizer

    if isinstance(pipe.tokenizer, CLIPTokenizer) and "prompt" in golden:
        ids_ours = pipe.tokenizer.encode(str(golden["prompt"]))
        same = bool((ids_ours == golden["text_ids"][0]).all())
        report["tokenizer"] = {"max_abs": 0.0 if same else 1.0,
                               "mean_abs": 0.0 if same else 1.0, "ok": same}

    # text encoder on the golden ids
    emb = pipe.text_encoder.apply(
        pipe.params["text"], jnp.asarray(golden["text_ids"])
    )
    report["text_encoder"] = _metrics(emb, golden["text_emb"],
                                      atol_max, atol_mean)

    # UNet eps on golden (latent, t, text_emb)
    eps = pipe.unet.apply(
        pipe.params["unet"],
        jnp.asarray(golden["unet_in"]),
        jnp.int32(golden["t"]),
        jnp.asarray(golden["text_emb"]),
    )
    report["unet"] = _metrics(eps, golden["unet_out"], atol_max, atol_mean)

    # VAE encode (deterministic mean) and decode, each from golden inputs
    lat = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(golden["vae_in"]),
        method=pipe.vae.encode,
    )
    report["vae_encode"] = _metrics(lat, golden["vae_latent"],
                                    atol_max, atol_mean)
    recon = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(golden["vae_latent"]),
        method=pipe.vae.decode,
    )
    report["vae_decode"] = _metrics(recon, golden["vae_recon"],
                                    atol_max, atol_mean)
    return report


def compare_golden_sdxl(
    pipe,
    golden,
    atol_max: float = 5e-2,
    atol_mean: float = 5e-3,
) -> Dict[str, Dict]:
    """SDXL golden replay (see validate_against_diffusers.dump_sdxl):
    both text towers from the golden token ids (penultimate hidden states
    concat + bigG pooled projection), the UNet with added conditioning
    rebuilt from the golden (pooled, time_ids), and the 0.13025-scaled VAE.

    Like `compare_golden`, every stage consumes GOLDEN inputs so a failure
    localises to one converter."""
    import jax.numpy as jnp

    from freefine_tpu.models.layers import timestep_embedding

    report: Dict[str, Dict] = {}

    ids = jnp.asarray(golden["text_ids"])
    ids2 = np.asarray(golden["text_ids_2"])
    eot = jnp.asarray(
        np.argmax(ids2 == int(golden["eos_token_id"]), axis=1), jnp.int32
    )
    h1 = pipe.text_encoder.apply(pipe.params["text"], ids, penultimate=True)
    h2, pooled = pipe.text_encoder_2.apply(
        pipe.params["text2"], jnp.asarray(ids2), eot
    )
    ctx = jnp.concatenate(
        [h1.astype(jnp.float32), h2.astype(jnp.float32)], axis=-1
    )
    report["text_dual"] = _metrics(ctx, golden["text_emb"],
                                   atol_max, atol_mean)
    report["text_pooled"] = _metrics(pooled.astype(jnp.float32),
                                     golden["pooled"], atol_max, atol_mean)

    # added conditioning exactly as SDXLFreeFine._added_cond builds it,
    # but from the GOLDEN pooled + time_ids (diffusers runs the Fourier
    # projection inside the UNet; we pre-fold it)
    tids = jnp.asarray(golden["time_ids"], jnp.float32).reshape(-1)
    temb = timestep_embedding(tids, 256).reshape(1, -1)
    added = jnp.concatenate([jnp.asarray(golden["pooled"]), temb], axis=-1)
    eps = pipe.unet.apply(
        pipe.params["unet"],
        jnp.asarray(golden["unet_in"]),
        jnp.int32(golden["t"]),
        jnp.asarray(golden["text_emb"]),
        added_cond=added,
    )
    report["unet"] = _metrics(eps, golden["unet_out"], atol_max, atol_mean)

    lat = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(golden["vae_in"]),
        method=pipe.vae.encode,
    )
    report["vae_encode"] = _metrics(lat, golden["vae_latent"],
                                    atol_max, atol_mean)
    recon = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(golden["vae_latent"]),
        method=pipe.vae.decode,
    )
    report["vae_decode"] = _metrics(recon, golden["vae_recon"],
                                    atol_max, atol_mean)
    return report


def dump_golden_from_pipe(pipe, out_path: str, prompt: str, seed: int = 0):
    """Produce a golden npz FROM a freefine pipeline (the self-consistency
    path used by tests, and a way to golden-pin our own numerics across
    refactors)."""
    import jax.numpy as jnp

    cfg = pipe.config
    rng = np.random.default_rng(seed)
    lh, lw = cfg.latent_height, cfg.latent_width
    lat = rng.normal(size=(1, lh, lw, 4)).astype(np.float32)
    img = rng.uniform(-1, 1, size=(1, cfg.height, cfg.width, 3)).astype(
        np.float32
    )
    ids = np.asarray(pipe.tokenizer.batch_encode([prompt]))
    emb = pipe.text_encoder.apply(pipe.params["text"], jnp.asarray(ids))
    t = 261 % cfg.scheduler.num_train_timesteps
    eps = pipe.unet.apply(
        pipe.params["unet"], jnp.asarray(lat), jnp.int32(t), emb
    )
    vlat = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(img), method=pipe.vae.encode
    )
    recon = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(vlat), method=pipe.vae.decode
    )
    np.savez(
        out_path,
        prompt=np.array(prompt),
        text_ids=ids.astype(np.int32),
        text_emb=np.asarray(emb, np.float32),
        unet_in=lat,
        t=np.int32(t),
        unet_out=np.asarray(eps, np.float32),
        vae_in=img,
        vae_latent=np.asarray(vlat, np.float32),
        vae_recon=np.asarray(recon, np.float32),
    )
    return out_path
