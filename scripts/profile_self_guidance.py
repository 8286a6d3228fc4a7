"""Chip profile of the SelfGuidance baseline (VERDICT r3 weak #5).

Times the two device stages of `SelfGuidance.edit` separately on the real
TPU — the CFG DDIM inversion scan vs the guided DDPM scan whose every step
runs `jax.value_and_grad` through the full UNet — to answer whether a
case-batched lane is worth building or the core is grad-bound (the
documented justification the expensive baselines carry in
BATCH_SCALING.md).

Usage: python scripts/profile_self_guidance.py [--steps 10] [--size 512]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from freefine_tpu.baselines.self_guidance import SelfGuidance
    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine
    from freefine_tpu.weights import cast_params_for_inference

    cfg = (
        tiny_pipeline_config()
        if args.tiny
        else sd15_pipeline_config(height=args.size, width=args.size)
    )
    pipe = FreeFine(config=cfg, init_random=True, seed=0)
    pipe.params = cast_params_for_inference(pipe.params)
    sg = SelfGuidance(pipe)

    h = cfg.height
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, h, 3), dtype=np.uint8)
    edit_param = [40.0, -20.0, 0, 0, 0, 0, 1.1, 1.1, 1.0]

    import jax

    # monkey-time the two jitted stages through the public entry
    stage_t = {}
    orig_invert, orig_guided = sg._invert, sg._guided_loop

    def timed(name, getter):
        def wrap(*a, **k):
            schedule, fn = getter(*a, **k)

            def timed_fn(*fa, **fk):
                t0 = time.time()
                out = fn(*fa, **fk)
                jax.block_until_ready(out)
                stage_t.setdefault(name, []).append(time.time() - t0)
                return out

            return schedule, timed_fn

        return wrap

    sg._invert = timed("invert", orig_invert)
    sg._guided_loop = timed("guided", orig_guided)

    t0 = time.time()
    out = sg.edit(img, "image of a dog", "dog", edit_param,
                  steps=args.steps, seed=1)
    total_compile = time.time() - t0
    print(f"first edit (incl. compiles): {total_compile:.1f}s")

    t0 = time.time()
    out = sg.edit(img, "image of a dog", "dog", edit_param,
                  steps=args.steps, seed=2)
    total = time.time() - t0
    inv = stage_t["invert"][-1]
    gui = stage_t["guided"][-1]
    print(
        f"steady state: total {total:.2f}s | invert scan {inv:.2f}s "
        f"({inv / total:.0%}) | guided grad scan {gui:.2f}s "
        f"({gui / total:.0%}) | host+vae {total - inv - gui:.2f}s"
    )
    print(
        f"per-step: invert {inv / args.steps * 1e3:.0f} ms "
        f"(2 UNet fwd) vs guided {gui / args.steps * 1e3:.0f} ms "
        f"(2 fwd + value_and_grad fwd+bwd)"
    )
    assert np.isfinite(np.asarray(out, np.float64)).all()


if __name__ == "__main__":
    main()
