"""Golden test: our Flax RAFT vs the reference's OWN vendored torch RAFT
(/root/reference/evaluation/MotionGuidance/flow_models/raft/ — pure
torch/numpy, reviewed before import; alt_cuda_corr import is guarded).

The full (non-small) model is instantiated, every parameter AND batch-norm
running statistic randomised, its state dict run through
`models.raft.convert_raft`, and `test_mode` flow compared at 128x160
(images must keep the coarsest correlation level >= 2px: RAFT's
bilinear_sampler normalises by (W-1), which is 0 — NaN — on a 1x1 level).

Writing this test surfaced and fixed a real deviation: RAFT enumerates
the correlation lookup window TRANSPOSED (delta = stack(meshgrid(dy, dx))
added to the (x, y) centroid, corr_raft.py:37-43 — upstream RAFT does
the same), so the x-offset varies along the first window axis.  Our
lookup used the 'intended' row-major ordering; trained checkpoints
encode the transposed one in the motion encoder's first conv, so flow
from real weights would have been garbage.  Also: our pyramid avg-pool
now floors odd dims like F.avg_pool2d(2,2).
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from freefine_tpu.models.raft import RAFT, convert_raft

RAFT_DIR = "/root/reference/evaluation/MotionGuidance/flow_models/raft"


class _Args(dict):
    """The reference accesses args both as attributes and with `in`."""

    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_raft():
    saved_path = list(sys.path)
    saved_mods = {
        k: sys.modules.get(k)
        for k in ("update", "extractor", "corr_raft", "raft_utils",
                  "raft_utils.utils")
    }
    sys.path.insert(0, RAFT_DIR)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_raft_mod", f"{RAFT_DIR}/raft.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path[:] = saved_path
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    net = mod.RAFT(_Args(
        small=False, mixed_precision=False, alternate_corr=False, dropout=0.0
    )).eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
        for name, b in net.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.02)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)
    return net


def test_raft_flow_golden(ref_raft):
    rng = np.random.RandomState(1)
    img1 = (rng.rand(1, 3, 128, 160) * 255).astype(np.float32)
    img2 = (rng.rand(1, 3, 128, 160) * 255).astype(np.float32)
    with torch.no_grad():
        _, want = ref_raft(
            torch.from_numpy(img1), torch.from_numpy(img2),
            iters=3, test_mode=True,
        )
    model = RAFT()
    i1 = jnp.asarray(img1.transpose(0, 2, 3, 1)) / 255.0
    i2 = jnp.asarray(img2.transpose(0, 2, 3, 1)) / 255.0
    params = model.init(jax.random.PRNGKey(0), i1, i2, 1)
    params = convert_raft(params, {k: v.numpy() for k, v in
                                   ref_raft.state_dict().items()})
    got = np.asarray(model.apply(params, i1, i2, 3))
    np.testing.assert_allclose(
        got, want.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )


def test_converter_consumes_every_reference_tensor(ref_raft):
    """Every torch tensor (params + BN buffers, minus num_batches_tracked
    counters) must land on a flax leaf.  The reference registers each
    shortcut BatchNorm TWICE — as `.norm3` and inside `.downsample.1`
    (extractor.py:44-45 puts the same module object in a Sequential) —
    so unique storages are counted, not state-dict keys."""
    model = RAFT()
    z = jnp.zeros((1, 128, 160, 3))
    params = model.init(jax.random.PRNGKey(0), z, z, 1)
    n_ours = len(jax.tree_util.tree_leaves(params))
    n_ref = len({
        v.data_ptr() for k, v in ref_raft.state_dict().items()
        if not k.endswith("num_batches_tracked")
    })
    assert n_ref == n_ours
