"""Visualization: VAE-free latent previews and step-annotated GIF logging.

Reimplements the reference's debugging instruments (SURVEY.md §5):
`Latent2RGBPreviewer` (/root/reference/src/demo/model.py:59-87 — a linear
4->3 projection of SD latents) and `save_intermediate_images_and_gif`
(:1121-1225).  The projection runs as one jitted matmul over the whole
trajectory, so previewing a 50-step scan costs one device round trip.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

# The SD-1.5 linear latent->RGB factors used by the reference previewer
# (the well-known taesd-style projection the notebooks pass in).
SD15_LATENT_RGB_FACTORS = np.array(
    [
        [0.3512, 0.2297, 0.3227],
        [0.3250, 0.4974, 0.2350],
        [-0.2829, 0.1762, 0.2721],
        [-0.2120, -0.2616, -0.7177],
    ],
    np.float32,
)


def latent_to_preview(
    latents: jnp.ndarray,
    factors: Optional[np.ndarray] = None,
    bias: Optional[np.ndarray] = None,
) -> np.ndarray:
    """[..., h, w, 4] latents -> uint8 [..., h, w, 3] preview images
    ((x+1)/2 clamp, model.py:83-87)."""
    f = jnp.asarray(factors if factors is not None else SD15_LATENT_RGB_FACTORS)
    img = latents.astype(jnp.float32) @ f
    if bias is not None:
        img = img + jnp.asarray(bias)
    img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0) * 255.0
    return np.asarray(img).astype(np.uint8)


def save_intermediate_gif(
    frames: Sequence[np.ndarray],
    output_folder: str = "sd_steps_output",
    gif_name: str = "sd_progress.gif",
    duration: int = 200,
    annotate: bool = True,
) -> str:
    """Save per-step PNGs + an animated GIF with step annotations
    (reference save_intermediate_images_and_gif_v2, model.py:1174-1225)."""
    from PIL import Image, ImageDraw

    os.makedirs(output_folder, exist_ok=True)
    images = []
    for idx, frame in enumerate(frames):
        img = Image.fromarray(np.asarray(frame).astype(np.uint8))
        if annotate:
            draw = ImageDraw.Draw(img)
            draw.text((10, 10), f"Step = {idx}", fill=(255, 0, 0))
        img.save(os.path.join(output_folder, f"denoise_step_{idx:03d}.png"))
        images.append(img)
    gif_path = os.path.join(output_folder, gif_name)
    if images:
        images[0].save(
            gif_path, save_all=True, append_images=images[1:],
            duration=duration, loop=0,
        )
    return gif_path
