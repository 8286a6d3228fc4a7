"""Two-process jax.distributed test: the REAL `_allgather_results` path.

The reference merges per-rank results with dist.all_gather_object over NCCL
(freefine_batch_infer_2d.py:242-243); our equivalent is a fixed-size uint8
process_allgather.  Single-process tests only ever exercise its fallback, so
here two actual processes are spawned over the jax.distributed CPU runtime.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address=sys.argv[2], num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    from freefine_tpu.parallel.harness import _allgather_results

    local = [{"proc": pid, "case": f"c{pid}", "val": pid * 10}]
    out = _allgather_results(local)
    assert len(out) == 2, out
    assert out[0] == [{"proc": 0, "case": "c0", "val": 0}], out
    assert out[1] == [{"proc": 1, "case": "c1", "val": 10}], out
    print(f"ALLGATHER-OK-{pid}")
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_allgather_results_two_processes(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    addr = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual-device fan-out in the workers
    # the worker script lives in tmp_path, so Python puts THAT (not cwd) on
    # sys.path — the repo root must be added explicitly for freefine_tpu
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), addr],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo", text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert "ALLGATHER-OK-0" in outs[0]
    assert "ALLGATHER-OK-1" in outs[1]
