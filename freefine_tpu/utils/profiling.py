"""Tracing & profiling: per-stage timing + jax.profiler integration.

The reference has no systematic profiling (SURVEY.md §5 — tqdm bars and
ad-hoc time.time() prints).  Since the north-star metric is edits/min/chip,
this module makes the three pipeline stages (invert / denoise / VAE)
first-class measurable units:

  * `StageTimer` — blocking wall-clock stage timers with summary stats;
  * `trace` — context manager around `jax.profiler.trace` for full XLA
    traces viewable in TensorBoard/Perfetto;
  * `annotate` — `jax.profiler.TraceAnnotation` pass-through for custom
    trace spans inside host code.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class StageTimer:
    """Accumulates wall-clock timings per named stage.

    with timer.stage("invert"):
        traj = pipe.invert(...)
        jax.block_until_ready(traj)   # caller controls sync granularity
    """

    def __init__(self):
        self.records: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            out[name] = {
                "count": len(vals),
                "total_s": sum(vals),
                "mean_s": sum(vals) / len(vals),
                "min_s": min(vals),
                "max_s": max(vals),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:>16}: n={s['count']:<4} mean={s['mean_s']*1e3:8.1f}ms "
                f"min={s['min_s']*1e3:8.1f}ms max={s['max_s']*1e3:8.1f}ms "
                f"total={s['total_s']:6.2f}s"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """XLA/TPU profiler trace (open in TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
