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
