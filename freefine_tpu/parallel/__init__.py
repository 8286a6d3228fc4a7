from freefine_tpu.parallel.harness import run_geobench_inference  # noqa: F401
