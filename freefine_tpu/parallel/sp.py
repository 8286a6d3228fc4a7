"""Sequence-parallel attention over the `model` mesh axis.

The reference has no sequence parallelism — at 512² its attention sequences
are small (4096 spatial / 77 text tokens, SURVEY.md §5 "Long-context"), and
its memory relief is attention slicing + xformers on one GPU
(evaluation/FreeFine/freefine_batch_infer_2d.py:156-157).  This framework's
long-sequence lanes are where that stops being enough: SDXL@1024² carries
S=4096 per transformer level with head_dim 64, and the SV3D video UNet's
spatial attention runs S=5184 over 21 frames — the dense fallback's S²
logits already OOM a single 16 GB chip (see BATCH_SCALING.md, SV3D note).

Scheme: allgather-KV sequence parallelism under `shard_map`.  Queries stay
sharded on the token axis; K, V (and the per-key mask rows that carry the
editing semantics — rank-1 biases, never dense S×S) are all-gathered along
the `model` axis over ICI; each shard runs the existing `masked_sdpa`
(Pallas flash on TPU, einsum elsewhere) on its local query block.  Per-chip
activation cost is O(S·Sk/n) time and O(S/n + Sk) memory, numerics are
exactly the unsharded op's (same kernel, same reduction order per query
row) — pinned by tests/test_sp.py and dryrun phase 4.

Allgather-KV is preferred over Ulysses head-scatter here because the edit
kernels key their masking off per-KEY rows shared by all heads: gathering
K/V keeps the mask plumbing identical to the single-chip path, and for
inference-sized batches the (n-1)/n · 2·Sk·E gather per layer rides ICI
well below the MXU time of the S·Sk matmuls it unlocks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.8 top-level API; experimental fallback for older jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from freefine_tpu.ops.attention import masked_sdpa


def sequence_parallel_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    mesh: Mesh,
    key_rows: Optional[jnp.ndarray] = None,
    model_axis: str = "model",
) -> jnp.ndarray:
    """`masked_sdpa` with the token axis sharded over `model_axis`.

    q: [B, Sq, E], k/v: [B, Sk, E], key_rows: optional [B, Sk] 0/1 mask.
    Sq and Sk must divide the `model_axis` size (pad via `masked_sdpa`'s
    own pad-and-mask route first if they don't).  The output keeps q's
    token sharding.
    """
    n = mesh.shape[model_axis]
    if q.shape[1] % n or k.shape[1] % n:
        raise ValueError(
            f"seq lengths {q.shape[1]}/{k.shape[1]} must divide the "
            f"'{model_axis}' axis size {n}"
        )
    tok = P(None, model_axis, None)
    row = P(None, model_axis)

    def local(q, k, v, rows):
        k = jax.lax.all_gather(k, model_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, model_axis, axis=1, tiled=True)
        if rows is not None:
            rows = jax.lax.all_gather(rows, model_axis, axis=1, tiled=True)
        return masked_sdpa(q, k, v, heads, rows)

    if key_rows is None:
        f = shard_map(
            lambda q, k, v: local(q, k, v, None),
            mesh=mesh,
            in_specs=(tok, tok, tok),
            out_specs=tok,
        )
        return f(q, k, v)
    f = shard_map(
        local, mesh=mesh, in_specs=(tok, tok, tok, row), out_specs=tok,
    )
    return f(q, k, v, key_rows)


def token_sharding(mesh: Mesh, model_axis: str = "model") -> NamedSharding:
    """Sharding that places [B, S, E] activations token-sharded on the mesh."""
    return NamedSharding(mesh, P(None, model_axis, None))
