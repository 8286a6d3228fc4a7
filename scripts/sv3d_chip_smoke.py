"""SV3D chip smoke: run the real-structure video UNet orbit sampler on TPU.

Chip-verifies the one model family the CPU suite can only exercise at toy
scale: the sgm-faithful SV3D video UNet (models/video_unet.py) driven by the
EDM Euler orbit sampler (models/sv3d.py, reference
generative-models/scripts/sampling/simple_video_sample.py flow).  Weights are
random (no checkpoints in this environment) — the point is that the full
spatial+temporal transformer stack compiles and executes on the device at
production geometry and yields finite latents, plus a throughput number.

Usage (TPU, from a clean shell — owns the chip while it runs):
    nohup python scripts/sv3d_chip_smoke.py > /tmp/sv3d_smoke.log 2>&1 &
CPU smoke:
    JAX_PLATFORMS=cpu python scripts/sv3d_chip_smoke.py \
        --frames 3 --latent 16 --steps 2 --channels 32
"""

import argparse
import os
import sys
import time

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(_ROOT, "examples"))
sys.path.insert(0, _ROOT)
import _bootstrap  # noqa: F401,E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _random_video_params(unet, frames, latent, seed=0):
    """Device-generated random params in bf16 (see bench._random_params_fast:
    model.init would run a full init forward — minutes on a 1-core host at
    SV3D scale — and materialise an f32 tree; eval_shape metadata + one jit
    builds the serving-dtype tree directly on the chip)."""
    sample = jnp.zeros((frames, latent, latent, unet.config.in_channels))
    t_cont = jnp.zeros((frames,))
    ctx = jnp.zeros((frames, 1, unet.config.context_dim))
    y = jnp.zeros((frames, unet.config.adm_in_channels))
    shapes = jax.eval_shape(
        lambda k: unet.init(k, sample, t_cont, ctx, y), jax.random.key(seed)
    )
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def build(key):
        out = []
        for i, (path, s) in enumerate(paths_leaves):
            name = getattr(path[-1], "key", str(path[-1]))
            if name == "scale":
                out.append(jnp.ones(s.shape, jnp.float32))
            elif len(s.shape) <= 1:
                out.append(jnp.zeros(s.shape, jnp.float32))
            else:
                k = jax.random.fold_in(key, i)
                out.append(
                    (jax.random.normal(k, s.shape, jnp.float32) * 0.02)
                    .astype(jnp.bfloat16)
                )
        return jax.tree_util.tree_unflatten(treedef, out)

    return jax.jit(build)(jax.random.key(seed))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=21,
                    help="orbit frames (real SV3D: 21)")
    ap.add_argument("--latent", type=int, default=72,
                    help="latent side (real SV3D: 576/8 = 72)")
    ap.add_argument("--steps", type=int, default=10,
                    help="EDM Euler steps (real SV3D: 50)")
    ap.add_argument("--channels", type=int, default=320,
                    help="model_channels (real SV3D: 320)")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import dataclasses

    from freefine_tpu.models.sv3d import SV3D
    from freefine_tpu.models.video_unet import VideoUNet, sv3d_config

    cfg = dataclasses.replace(
        sv3d_config(), model_channels=args.channels, num_frames=args.frames,
        norm_num_groups=min(32, args.channels // 4),
        num_head_channels=min(64, args.channels),
    )
    unet = VideoUNet(cfg)
    t0 = time.time()
    params = _random_video_params(unet, args.frames, args.latent)
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"# params={n_params/1e6:.0f}M gen={time.time()-t0:.1f}s "
          f"device={jax.default_backend()}", flush=True)

    cond = jnp.zeros((1, args.latent, args.latent, 4))
    clip_tok = jnp.zeros((1, 1, cfg.context_dim))
    azim = list(np.linspace(0, 360, args.frames, endpoint=False))
    elev = [10.0] * args.frames

    # Params must be a jit ARGUMENT: closing over the 1.5B-param tree bakes
    # ~3 GB of constants into the lowered module (slow to ship over the
    # remote-TPU tunnel and re-staged per executable).
    def _sample(p, k):
        sv = SV3D(unet=unet, unet_params=p,
                  num_frames=args.frames, num_steps=args.steps)
        return sv.sample_latents(cond, clip_tok, azim, elev, rng=k)

    sample_j = jax.jit(_sample)
    sample = lambda k: sample_j(params, k)  # noqa: E731
    t0 = time.time()
    lat = jax.block_until_ready(sample(jax.random.key(0)))
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(args.repeats):
        lat = jax.block_until_ready(sample(jax.random.key(i + 1)))
    per_orbit = (time.time() - t0) / args.repeats

    assert lat.shape == (args.frames, args.latent, args.latent, 4)
    finite = bool(np.isfinite(np.asarray(lat, np.float32)).all())
    print(f"# compile={compile_s:.1f}s per_orbit={per_orbit:.2f}s "
          f"finite={finite} shape={tuple(lat.shape)}", flush=True)
    import json
    print(json.dumps({
        "metric": f"SV3D orbits/min ({args.frames}f@{args.latent}^2 latent, "
                  f"{args.steps}-step)",
        "value": round(60.0 / per_orbit, 3),
        "unit": "orbits/min",
        "finite": finite,
    }), flush=True)


if __name__ == "__main__":
    main()
