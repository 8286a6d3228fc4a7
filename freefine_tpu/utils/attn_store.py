"""Attention-map store — the reference's debug instrument
(AttentionControl / AttentionStore, /root/reference/src/utils/attention.py:
565-638) re-hosted on flax's `sow` mechanism.

The reference monkey-patches every attention forward to push probability
maps (queries <= 32x32 only) into a mutable store, summing per step and
averaging at the end.  Here the UNet stays pure: with
`EditConfig(store_attention=True)` every attention layer sows a
head-averaged map into the "intermediates" collection, one forward at a
time:

    out, vs = pipe.unet.apply(params, x, t, ctx, edit_cfg=cfg,
                              mutable=["intermediates"])
    store.update(vs["intermediates"])      # once per step
    maps = store.get_average_attention()   # averaged over steps

or use `FreeFine.attention_maps(...)` for a one-step probe.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def classify_layer(path: tuple) -> str:
    """Module path -> the reference's store key '{place}_{self|cross}'
    (attention.py:601-615)."""
    top = path[0]
    if top.startswith("down_blocks"):
        place = "down"
    elif top.startswith("mid_block") or top.startswith("mid"):
        place = "mid"
    elif top.startswith("up_blocks"):
        place = "up"
    else:
        place = top
    kind = "self" if path[-2].endswith("attn1") else "cross"
    return f"{place}_{kind}"


def collect_maps(intermediates: Dict) -> Dict[str, List[np.ndarray]]:
    """Flatten one forward's sown maps into the reference's
    {place_kind: [per-layer maps]} layout, in module-path order."""
    out: Dict[str, List[np.ndarray]] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            if "attn_probs" in tree and not isinstance(tree["attn_probs"], dict):
                # sow stores a tuple of arrays (one per call; here one)
                for arr in tree["attn_probs"]:
                    out.setdefault(
                        classify_layer(path + ("attn_probs",)), []
                    ).append(np.asarray(arr))
                return
            for k in sorted(tree):
                walk(tree[k], path + (k,))

    walk(intermediates, ())
    return out


class AttentionStore:
    """Step-averaging accumulator (reference AttentionStore.between_steps /
    get_average_attention, attention.py:617-638)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.cur_step = 0
        self.attention_store: Dict[str, List[np.ndarray]] = {}

    def update(self, intermediates: Dict):
        """Accumulate one UNet forward's sown maps (== one diffusion step)."""
        step = collect_maps(intermediates)
        if not self.attention_store:
            self.attention_store = step
        else:
            for key, maps in step.items():
                for i, m in enumerate(maps):
                    self.attention_store[key][i] = (
                        self.attention_store[key][i] + m
                    )
        self.cur_step += 1

    def get_average_attention(self) -> Dict[str, List[np.ndarray]]:
        return {
            key: [m / self.cur_step for m in maps]
            for key, maps in self.attention_store.items()
        }
