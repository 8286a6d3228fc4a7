"""Real-checkpoint validation against diffusers (golden-dump protocol).

The SD-1.5 UNet/VAE converters (freefine_tpu.weights.load_sd15) are
roundtrip-tested but, with no diffusers and no checkpoint downloads in the
TPU environment, never forward-compared.  This script closes that gap in
two halves that can run on different machines:

  dump  (where diffusers + torch + the checkpoint exist):
      python scripts/validate_against_diffusers.py dump \
          --model /path/to/stable-diffusion-v1-5 --out golden_sd15.npz
      Runs one text encode, one VAE encode+decode, and one UNet eps
      prediction at t=261 on seeded inputs; stores every input and output
      (NHWC, float32) in one npz.

  check (on the TPU machine, with converted weights):
      python scripts/validate_against_diffusers.py check \
          --golden golden_sd15.npz --weights /path/to/sd15_diffusers_dir
      Loads the same checkpoint through freefine_tpu.weights.load_sd15
      (float32), replays the dumped inputs through the Flax models and
      asserts each output matches within tolerance.

Tolerances: fp32-vs-fp32 across frameworks differs by kernel algebra only;
the defaults (atol 5e-2 / mean 5e-3 on eps, which is ~N(0,1)-scaled) are
far below any behavioural difference.  `freefine_tpu.utils.golden` holds
the comparison logic so the check side is unit-testable without diffusers.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

T_STEP = 261
PROMPT = "a photograph of an astronaut riding a horse"


def dump(model_dir: str, out_path: str, height: int = 512):
    """Works for any single-encoder SD checkpoint: SD-1.5 (512) and
    SD-2.1 (--height 768, the MD metric's DIFT backbone) — diffusers
    loads both through StableDiffusionPipeline."""
    import torch
    from diffusers import StableDiffusionPipeline

    torch.manual_seed(0)
    pipe = StableDiffusionPipeline.from_pretrained(
        model_dir, torch_dtype=torch.float32, safety_checker=None
    )
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(1, 4, height // 8, height // 8)).astype(np.float32)
    img = rng.uniform(-1, 1, size=(1, 3, height, height)).astype(np.float32)

    ids = pipe.tokenizer(
        [PROMPT], padding="max_length", max_length=77, return_tensors="pt"
    ).input_ids
    with torch.no_grad():
        emb = pipe.text_encoder(ids)[0]
        eps = pipe.unet(torch.from_numpy(lat), T_STEP, emb).sample
        post = pipe.vae.encode(torch.from_numpy(img)).latent_dist
        vae_lat = post.mean * pipe.vae.config.scaling_factor
        recon = pipe.vae.decode(vae_lat / pipe.vae.config.scaling_factor).sample

    def nhwc(x):
        return np.asarray(x, np.float32).transpose(0, 2, 3, 1)

    np.savez(
        out_path,
        prompt=np.array(PROMPT),
        text_ids=ids.numpy().astype(np.int32),
        text_emb=emb.numpy().astype(np.float32),
        unet_in=nhwc(lat),
        t=np.int32(T_STEP),
        unet_out=nhwc(eps.numpy()),
        vae_in=nhwc(img),
        vae_latent=nhwc(vae_lat.numpy()),
        vae_recon=nhwc(recon.numpy()),
    )
    print(f"wrote {out_path}")


def dump_sdxl(model_dir: str, out_path: str, height: int = 1024):
    """SDXL golden dump: dual-tower text conditioning (penultimate hidden
    states + bigG pooled projection), one UNet eps with added_cond_kwargs,
    and the 0.13025-scaled VAE roundtrip."""
    import torch
    from diffusers import StableDiffusionXLPipeline

    torch.manual_seed(0)
    pipe = StableDiffusionXLPipeline.from_pretrained(
        model_dir, torch_dtype=torch.float32
    )
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(1, 4, height // 8, height // 8)).astype(np.float32)
    img = rng.uniform(-1, 1, size=(1, 3, height, height)).astype(np.float32)

    kw = dict(padding="max_length", max_length=77, return_tensors="pt")
    ids = pipe.tokenizer([PROMPT], **kw).input_ids
    ids2 = pipe.tokenizer_2([PROMPT], **kw).input_ids
    time_ids = torch.tensor(
        [[height, height, 0, 0, height, height]], dtype=torch.float32
    )
    with torch.no_grad():
        h1 = pipe.text_encoder(ids, output_hidden_states=True).hidden_states[-2]
        out2 = pipe.text_encoder_2(ids2, output_hidden_states=True)
        h2, pooled = out2.hidden_states[-2], out2.text_embeds
        emb = torch.cat([h1, h2], dim=-1)
        eps = pipe.unet(
            torch.from_numpy(lat), T_STEP, emb,
            added_cond_kwargs={"text_embeds": pooled, "time_ids": time_ids},
        ).sample
        post = pipe.vae.encode(torch.from_numpy(img)).latent_dist
        vae_lat = post.mean * pipe.vae.config.scaling_factor
        recon = pipe.vae.decode(vae_lat / pipe.vae.config.scaling_factor).sample

    def nhwc(x):
        return np.asarray(x, np.float32).transpose(0, 2, 3, 1)

    np.savez(
        out_path,
        prompt=np.array(PROMPT),
        text_ids=ids.numpy().astype(np.int32),
        text_ids_2=ids2.numpy().astype(np.int32),
        eos_token_id=np.int32(pipe.tokenizer_2.eos_token_id),
        text_emb=emb.numpy().astype(np.float32),
        pooled=pooled.numpy().astype(np.float32),
        time_ids=time_ids.numpy().astype(np.float32),
        unet_in=nhwc(lat),
        t=np.int32(T_STEP),
        unet_out=nhwc(eps.numpy()),
        vae_in=nhwc(img),
        vae_latent=nhwc(vae_lat.numpy()),
        vae_recon=nhwc(recon.numpy()),
    )
    print(f"wrote {out_path}")


def check_sdxl(golden_path: str, weights_dir: str, report_path: str = None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from freefine_tpu.config import sdxl_pipeline_config
    from freefine_tpu.sdxl import SDXLFreeFine
    from freefine_tpu.utils.golden import compare_golden_sdxl
    from freefine_tpu.weights import load_sdxl

    # params are resolution-independent: init the random structure tree at
    # a tiny spatial size (full-res f32 init takes minutes on one core);
    # the golden replay then runs at the dumped shapes.
    pipe = SDXLFreeFine(
        config=sdxl_pipeline_config(height=64, width=64, dtype=jnp.float32),
        init_random=True,
        tokenizer_path=osp.join(weights_dir, "tokenizer"),
    )
    load_sdxl(pipe, weights_dir, dtype=jnp.float32)
    report = compare_golden_sdxl(pipe, np.load(golden_path, allow_pickle=True))
    _finish(report, golden_path, weights_dir, report_path)


def _finish(report, golden_path, weights_dir, report_path):
    failed = [k for k, r in report.items() if not r["ok"]]
    for k, r in report.items():
        print(f"{k}: max_abs={r['max_abs']:.3e} mean_abs={r['mean_abs']:.3e} "
              f"{'OK' if r['ok'] else 'FAIL'}")
    if report_path:
        import json

        payload = {
            "golden": osp.abspath(golden_path),
            "weights": osp.abspath(weights_dir),
            "passed": not failed,
            "results": {
                k: {kk: (bool(vv) if kk == "ok" else float(vv))
                    for kk, vv in r.items()}
                for k, r in report.items()
            },
        }
        with open(report_path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {report_path}")
    if failed:
        raise SystemExit(f"golden mismatch: {failed}")
    print("all golden checks passed")


def check(golden_path: str, weights_dir: str, report_path: str = None,
          config: str = "sd15"):
    import jax

    jax.config.update("jax_platforms", "cpu")  # fp32 parity, not speed
    import jax.numpy as jnp

    from freefine_tpu.config import sd15_pipeline_config, sd21_pipeline_config
    from freefine_tpu.pipeline import FreeFine
    from freefine_tpu.utils.golden import compare_golden
    from freefine_tpu.weights import load_sd15

    cfg_fn = {"sd15": sd15_pipeline_config, "sd21": sd21_pipeline_config}[config]
    pipe = FreeFine(
        config=cfg_fn(dtype=jnp.float32),
        init_random=True,
        tokenizer_path=osp.join(weights_dir, "tokenizer"),
    )
    load_sd15(pipe, weights_dir, dtype=jnp.float32)
    report = compare_golden(pipe, np.load(golden_path, allow_pickle=True))
    _finish(report, golden_path, weights_dir, report_path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--model", required=True)
    d.add_argument("--out", default="golden_sd15.npz")
    d.add_argument("--height", type=int, default=512)
    c = sub.add_parser("check")
    c.add_argument("--golden", required=True)
    c.add_argument("--weights", required=True)
    c.add_argument("--report", default=None,
                   help="write a machine-readable JSON report here")
    c.add_argument("--config", default="sd15", choices=["sd15", "sd21"],
                   help="pipeline config matching the dumped checkpoint "
                        "(sd21 = the MD metric's DIFT backbone; dump it "
                        "with --height 768)")
    dx = sub.add_parser("dump-sdxl")
    dx.add_argument("--model", required=True)
    dx.add_argument("--out", default="golden_sdxl.npz")
    dx.add_argument("--height", type=int, default=1024)
    cx = sub.add_parser("check-sdxl")
    cx.add_argument("--golden", required=True)
    cx.add_argument("--weights", required=True)
    cx.add_argument("--report", default=None)
    a = p.parse_args(argv)
    if a.cmd == "dump":
        dump(a.model, a.out, a.height)
    elif a.cmd == "dump-sdxl":
        dump_sdxl(a.model, a.out, a.height)
    elif a.cmd == "check-sdxl":
        check_sdxl(a.golden, a.weights, a.report)
    else:
        check(a.golden, a.weights, a.report, a.config)


if __name__ == "__main__":
    main()
