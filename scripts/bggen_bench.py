"""Paired chip measurement: per-case vs shared-source background generation.

The GeoBench removal stage (bggen -> inp_img_blended/) runs num_step-1
denoise steps per instance (start_step=1); instances of one da_n share the
source image, so the shared lane saves the inversion AND the per-step
reference stream.  Prints backgrounds/min for both lanes.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np

import bench as B  # noqa: E402  (for _random_params_fast)
from freefine_tpu.config import sd15_pipeline_config
from freefine_tpu.pipeline import BatchedFreeFine, FreeFine

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
steps = 50
pipe = FreeFine(config=sd15_pipeline_config(), params={})
pipe.params = B._random_params_fast(pipe, "bf16")
batched = BatchedFreeFine(pipe)

h = w = pipe.config.height
rng = np.random.default_rng(0)
ori = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
cases = []
for i in range(batch):
    m = np.zeros((h, w), np.uint8)
    m[40 + 8 * i : 140 + 8 * i, 60 : 200] = 255
    cases.append(dict(ori_img=ori, ori_mask=m, guidance_text="empty scene"))
kw = dict(num_step=steps, start_step=1, end_step=35, guidance_scale=7.5,
          eta=1.0)

out = {}
for name, fn in [("percase", batched.background_generation),
                 ("shared", batched.background_generation_shared_source)]:
    fn(cases, seed=[1] * batch, **kw)      # compile + warm
    t0 = time.time()
    reps = 2
    for r in range(reps):
        fn(cases, seed=[r + 2] * batch, **kw)
    per_bg = (time.time() - t0) / reps / batch
    out[name] = round(60.0 / per_bg, 2)
    print(f"# {name}: {per_bg:.2f} s/bg -> {out[name]} bg/min", file=sys.stderr)
print(json.dumps({"metric": f"bggen bg/min batch {batch} (per-case vs shared)",
                  **out}))
