"""Golden dump/load protocol tests (the diffusers validation kit's offline
half — scripts/validate_against_diffusers.py runs the dump where diffusers
exists; these tests verify the check side with synthetic dumps)."""

import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.pipeline import FreeFine
from freefine_tpu.utils.golden import compare_golden, dump_golden_from_pipe


@pytest.fixture(scope="module")
def tiny_pipe():
    return FreeFine(config=tiny_pipeline_config(), init_random=True)


def test_golden_self_consistency(tiny_pipe, tmp_path):
    """A dump produced by the pipeline itself must pass its own check."""
    path = dump_golden_from_pipe(tiny_pipe, str(tmp_path / "g.npz"), "a cat")
    report = compare_golden(tiny_pipe, np.load(path, allow_pickle=True))
    assert set(report) >= {"text_encoder", "unet", "vae_encode", "vae_decode"}
    for k, r in report.items():
        assert r["ok"], (k, r)
        assert r["max_abs"] < 1e-5, (k, r)


def test_golden_detects_wrong_weights(tiny_pipe, tmp_path):
    """A dump from DIFFERENT weights must fail the check (the kit can
    actually catch converter bugs, not just vacuously pass)."""
    path = dump_golden_from_pipe(tiny_pipe, str(tmp_path / "g.npz"), "a cat")
    other = FreeFine(config=tiny_pipeline_config(), init_random=True, seed=123)
    report = compare_golden(other, np.load(path, allow_pickle=True))
    assert not report["unet"]["ok"]
    assert not report["text_encoder"]["ok"]


def test_golden_stage_isolation(tiny_pipe, tmp_path):
    """Corrupting only the VAE-decode reference flags only that stage —
    every stage replays GOLDEN inputs, not upstream outputs."""
    path = dump_golden_from_pipe(tiny_pipe, str(tmp_path / "g.npz"), "a cat")
    g = dict(np.load(path, allow_pickle=True))
    g["vae_recon"] = g["vae_recon"] + 1.0
    report = compare_golden(tiny_pipe, g)
    assert not report["vae_decode"]["ok"]
    assert report["unet"]["ok"] and report["vae_encode"]["ok"]


def test_golden_sdxl_self_consistency(tmp_path):
    """SDXL variant: a synthetic dump built exactly like
    validate_against_diffusers.dump_sdxl (dual towers, pooled projection,
    added-cond UNet, VAE roundtrip) passes compare_golden_sdxl against the
    producing pipeline, and fails against different weights."""
    import jax.numpy as jnp

    from freefine_tpu.config import tiny_sdxl_pipeline_config
    from freefine_tpu.models.layers import timestep_embedding
    from freefine_tpu.sdxl import SDXLFreeFine
    from freefine_tpu.utils.golden import compare_golden_sdxl

    pipe = SDXLFreeFine(config=tiny_sdxl_pipeline_config(), init_random=True)
    cfg = pipe.config
    rng = np.random.default_rng(0)
    lh, lw = cfg.latent_height, cfg.latent_width
    lat = rng.normal(size=(1, lh, lw, 4)).astype(np.float32)
    img = rng.uniform(-1, 1, size=(1, cfg.height, cfg.width, 3)).astype(
        np.float32
    )
    ids = np.asarray(pipe.tokenizer.batch_encode(["a cat"]))
    ids2, eot = pipe._openclip_ids(ids)
    h1 = pipe.text_encoder.apply(
        pipe.params["text"], jnp.asarray(ids), penultimate=True
    )
    h2, pooled = pipe.text_encoder_2.apply(
        pipe.params["text2"], jnp.asarray(ids2), jnp.asarray(eot)
    )
    emb = np.concatenate(
        [np.asarray(h1, np.float32), np.asarray(h2, np.float32)], axis=-1
    )
    time_ids = np.asarray(
        [[cfg.height, cfg.width, 0, 0, cfg.height, cfg.width]], np.float32
    )
    temb = timestep_embedding(jnp.asarray(time_ids[0]), 256).reshape(1, -1)
    added = jnp.concatenate([jnp.asarray(pooled, jnp.float32), temb], axis=-1)
    eps = pipe.unet.apply(
        pipe.params["unet"], jnp.asarray(lat), jnp.int32(261),
        jnp.asarray(emb), added_cond=added,
    )
    vlat = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(img), method=pipe.vae.encode
    )
    recon = pipe.vae.apply(
        pipe.params["vae"], jnp.asarray(vlat), method=pipe.vae.decode
    )
    golden = dict(
        prompt=np.array("a cat"),
        text_ids=ids.astype(np.int32),
        text_ids_2=ids2.astype(np.int32),
        eos_token_id=np.int32(pipe.tokenizer.eos),
        text_emb=emb,
        pooled=np.asarray(pooled, np.float32),
        time_ids=time_ids,
        unet_in=lat,
        t=np.int32(261),
        unet_out=np.asarray(eps, np.float32),
        vae_in=img,
        vae_latent=np.asarray(vlat, np.float32),
        vae_recon=np.asarray(recon, np.float32),
    )
    report = compare_golden_sdxl(pipe, golden)
    for k, r in report.items():
        assert r["ok"], (k, r)
        assert r["max_abs"] < 1e-5, (k, r)

    other = SDXLFreeFine(config=tiny_sdxl_pipeline_config(),
                         init_random=True, seed=123)
    report2 = compare_golden_sdxl(other, golden)
    assert not report2["unet"]["ok"]
    assert not report2["text_dual"]["ok"]
