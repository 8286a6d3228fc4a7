"""DIFT semantic correspondence on TPU.

The reference extracts Stable-Diffusion UNet up-block features as semantic
descriptors (evaluation/metrics/MD/dift_sd.py: noise the image to t=261,
one UNet forward, grab up_ft[up_ft_index], average over an ensemble of 8
noise draws) and matches points by cosine similarity over the feature map
(mean_distance.py:152-165).  The same utility also exists in the core
(`src/utils/geo_utils.py:36-80`, cosine-similarity correspondence).

Here the whole ensemble runs as ONE batched jitted forward through the Flax
UNet's `return_features` path, and matching is a batched cosine argmax.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dift_features(
    unet_apply,
    params,
    latents: jnp.ndarray,       # [1, h, w, 4] clean VAE latents of the image
    text_emb: jnp.ndarray,      # [1, 77, D] prompt embedding
    schedule,                   # DDIMSchedule (alphas_cumprod table)
    rng: jax.Array,
    t: int = 261,
    up_ft_index: int = 1,
    ensemble_size: int = 8,
) -> jnp.ndarray:
    """-> [h', w', C] ensemble-averaged up-block feature map."""
    lat = jnp.tile(latents, (ensemble_size, 1, 1, 1))
    noise = jax.random.normal(rng, lat.shape, jnp.float32)
    a = schedule.alphas_cumprod[t]
    noised = jnp.sqrt(a) * lat + jnp.sqrt(1.0 - a) * noise
    emb = jnp.tile(text_emb, (ensemble_size, 1, 1))
    _, feats = unet_apply(
        params, noised, jnp.int32(t), emb, return_features=True
    )
    # features list: [mid, up_0, up_1, up_2, up_3]; reference up_ft_indices
    # count up blocks 0..3 (dift_sd.py:123-155)
    f = feats[1 + up_ft_index]
    return f.astype(jnp.float32).mean(0)


@jax.jit
def match_points(
    ft_src: jnp.ndarray,   # [H, W, C] source features (image resolution)
    ft_tgt: jnp.ndarray,   # [H, W, C] target features
    points: jnp.ndarray,   # [N, 2] (row, col) source keypoints
) -> jnp.ndarray:
    """For each source point, the (row, col) of max cosine similarity in the
    target feature map (mean_distance.py:157-161)."""
    h, w, c = ft_tgt.shape
    tgt = ft_tgt.reshape(-1, c)
    tgt_n = tgt / (jnp.linalg.norm(tgt, axis=-1, keepdims=True) + 1e-8)

    src_vecs = ft_src[points[:, 0], points[:, 1]]          # [N, C]
    src_n = src_vecs / (jnp.linalg.norm(src_vecs, axis=-1, keepdims=True) + 1e-8)
    sims = src_n @ tgt_n.T                                  # [N, H*W]
    idx = jnp.argmax(sims, axis=-1)
    return jnp.stack([idx // w, idx % w], axis=-1)


def upsample_features(f: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """[h, w, C] -> [hw[0], hw[1], C] bilinear (F.interpolate equivalent)."""
    return jax.image.resize(f, (hw[0], hw[1], f.shape[-1]), method="bilinear")


def make_sd_featurizer(
    pipe,
    t: int = 261,
    up_ft_index: int = 1,
    ensemble_size: int = 8,
    seed: int = 0,
):
    """DIFT featurizer over a `FreeFine` pipeline's own SD UNet.

    Matches the reference SDFeaturizer protocol (dift_sd.py:189-235):
    VAE-encode the image, noise it to train-step `t`, one UNet forward per
    ensemble member (batched here), average up-block `up_ft_index`
    features, bilinearly upsample to the input image's resolution.

    Documented deviation: the reference loads a separate SD-2.1 checkpoint
    as the descriptor backbone; we reuse the pipeline's SD UNet so the
    metric runs from one converted checkpoint.  The ensemble noise is
    seeded (deterministic metric), unlike the reference's global torch RNG.

    Returns `featurize(img_uint8_hwc, prompt) -> np.ndarray [H, W, C]`.
    """
    import numpy as np

    schedule = pipe._schedule(50)  # only the full alphas_cumprod table is used

    def unet_apply(params, sample, tt, emb, return_features=False):
        return pipe.unet.apply(
            params["unet"], sample, tt, emb, return_features=return_features
        )

    def run(params, lat, emb, rng):
        return dift_features(
            unet_apply, params, lat, emb, schedule, rng,
            t=t, up_ft_index=up_ft_index, ensemble_size=ensemble_size,
        )

    run_j = jax.jit(run)
    rng = jax.random.key(seed)

    def featurize(img: "np.ndarray", prompt: str) -> "np.ndarray":
        h, w = img.shape[:2]
        lat = pipe.image_to_latent(pipe._prep_image(img))
        emb = pipe.encode_text([prompt])
        f = run_j(pipe.params, lat, emb, rng)
        return np.asarray(upsample_features(f, (h, w)), np.float32)

    return featurize
