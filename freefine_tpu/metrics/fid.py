"""FID family: batched on-TPU feature extraction + Fréchet / MMD distances.

Mirrors the reference protocol (evaluation/metrics/FID/):
  * FID       — InceptionV3 pool3 (2048-d) Fréchet distance, gen vs the
    real-image directory (fid.py:23-44, dims 2048, batch 64);
  * FID_DINO  — DINOv2 ViT-B/14 cls features (768-d) Fréchet (fid_dino.py);
  * FID_KD    — subset-averaged polynomial-kernel MMD over the same DINOv2
    features (fid_kd.py).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

from freefine_tpu.metrics.common import (
    compute_mmd_subsets,
    fid_from_features,
)


def batched_features(
    paths: Sequence[str],
    encode_batch: Callable[[np.ndarray], np.ndarray],
    preprocess: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 64,
) -> np.ndarray:
    """Stream image files through a jitted batch encoder."""
    from PIL import Image

    feats: List[np.ndarray] = []
    buf: List[np.ndarray] = []

    def flush():
        if not buf:
            return
        batch = np.concatenate(buf, axis=0)
        # pad the tail batch to the compiled batch size
        n = batch.shape[0]
        if n < batch_size:
            batch = np.concatenate(
                [batch, np.zeros((batch_size - n,) + batch.shape[1:], batch.dtype)]
            )
        feats.append(np.asarray(encode_batch(batch))[:n])
        buf.clear()

    for p in paths:
        img = np.array(Image.open(p).convert("RGB"))
        buf.append(np.asarray(preprocess(img)))
        if len(buf) == batch_size:
            flush()
    flush()
    return np.concatenate(feats, axis=0)


def make_inception_encoder(params, batch_size: int = 64):
    """(encode_batch, preprocess) pair for the FID InceptionV3."""
    import jax

    from freefine_tpu.models.inception import InceptionV3FID, preprocess_fid

    model = InceptionV3FID()
    apply = jax.jit(lambda x: model.apply(params, x))
    return (lambda batch: apply(batch)), (lambda img: preprocess_fid(img))


def fid_inception(
    gen_paths: Sequence[str], real_paths: Sequence[str], params,
    batch_size: int = 64,
) -> float:
    enc, prep = make_inception_encoder(params, batch_size)
    fg = batched_features(gen_paths, enc, prep, batch_size)
    fr = batched_features(real_paths, enc, prep, batch_size)
    return fid_from_features(fg, fr)


def fid_kd_from_features(feats_gen: np.ndarray, feats_real: np.ndarray) -> float:
    return compute_mmd_subsets(feats_real, feats_gen)
