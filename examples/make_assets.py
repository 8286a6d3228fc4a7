"""Generate the bundled UI example assets (deterministic, synthetic).

The reference ships real photos under Examples/ (SURVEY.md §2.2); with no
network egress this repo bundles procedurally rendered scenes instead —
small 256x256 PNGs with clean object masks, enough to drive every tab.
Re-run to regenerate: python examples/make_assets.py
"""

import os
import os.path as osp

import numpy as np
from PIL import Image

OUT = osp.join(osp.dirname(osp.abspath(__file__)), "assets")


def _grid(size=256):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    return y, x


def _save(name, arr):
    os.makedirs(OUT, exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(osp.join(OUT, name))
    print("wrote", osp.join(OUT, name))


def _ellipse_mask(cy, cx, ry, rx, size=256):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    return (((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2 <= 1.0)


def scene_cup(size=256):
    """A 'cup' (rounded body + handle) on a tabletop gradient."""
    y, x = _grid(size)
    img = np.stack([
        140 + 80 * y, 120 + 60 * y, 100 + 40 * y,
    ], -1)  # warm table gradient
    img += np.sin(x * 40)[..., None] * 6  # wood grain
    body = _ellipse_mask(150, 120, 55, 38, size)
    handle = _ellipse_mask(150, 168, 26, 18, size) & ~_ellipse_mask(
        150, 168, 14, 9, size)
    mask = body | handle
    cup_color = np.array([60, 90, 180], np.float32)
    shade = 1.0 - 0.5 * ((x - 120 / size * 1.0) ** 2)
    img[mask] = (cup_color[None] * shade[mask][:, None]
                 + np.array([20, 20, 30]))
    _save("cup.png", np.clip(img, 0, 255))
    _save("cup_mask.png", mask.astype(np.uint8) * 255)


def scene_bird(size=256):
    """Appearance-transfer pair: a textured 'bird' and a background scene
    with a plain bird-shaped region."""
    y, x = _grid(size)
    # appearance image: striped bird on sky
    app = np.stack([120 + 80 * (1 - y), 160 + 60 * (1 - y),
                    230 * np.ones_like(y)], -1)
    bird = _ellipse_mask(130, 128, 45, 60, size) | _ellipse_mask(
        95, 170, 22, 26, size)
    stripes = (np.sin(y * 60) > 0)[..., None]
    app[bird] = np.where(
        stripes[bird], np.array([200, 120, 40]), np.array([90, 40, 20])
    )
    _save("bird_app.png", np.clip(app, 0, 255))
    _save("bird_app_mask.png", bird.astype(np.uint8) * 255)

    # background image: gray bird silhouette on a field
    bg = np.stack([90 + 60 * y, 140 + 50 * y, 90 + 30 * y], -1)
    bg += (np.sin(x * 25) * np.cos(y * 18))[..., None] * 8  # foliage
    bird2 = _ellipse_mask(150, 110, 40, 55, size) | _ellipse_mask(
        118, 148, 20, 24, size)
    bg[bird2] = np.array([150, 150, 150])
    _save("bird_bg.png", np.clip(bg, 0, 255))
    _save("bird_bg_mask.png", bird2.astype(np.uint8) * 255)


if __name__ == "__main__":
    scene_cup()
    scene_bird()
