"""Generate the bundled example assets (deterministic, synthetic).

The reference ships real photos under Examples/ organised by task
(Editing/{2D,3D}, Removal, Appearance, Compose, Partial-Editing —
SURVEY.md §2.2); with no network egress this repo bundles procedurally
rendered scenes in the SAME per-task tree, so every app tab and example
script runs out of the box:

  examples/assets/
    Editing/2D/<name>/{source.png, source_mask.png}
    Editing/3D/<name>/{source.png, source_mask.png}
    Removal/<name>/{source.png, source_mask.png}
    Appearance/<name>/{ori.png, ori_mask.png, app.png, app_mask.png}
    Compose/pair<k>/{source.png, source_mask.png, target.png,
                     target_mask.png}
    Partial-Editing/<name>/{ori.png, full_mask.png, partial_mask_0.png}

Legacy flat files (cup.png, bird_*.png) are kept for older scripts.
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


def _save(relpath, arr):
    path = osp.join(OUT, relpath)
    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)
    print("wrote", path)


def _ellipse_mask(cy, cx, ry, rx, size=256):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    return (((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2 <= 1.0)


# -- scene painters ----------------------------------------------------------


def _table(size=256, tone=(140, 120, 100)):
    y, x = _grid(size)
    img = np.stack([
        tone[0] + 80 * y, tone[1] + 60 * y, tone[2] + 40 * y,
    ], -1)
    img += np.sin(x * 40)[..., None] * 6  # wood grain
    return img


def _field(size=256):
    y, x = _grid(size)
    img = np.stack([90 + 60 * y, 140 + 50 * y, 90 + 30 * y], -1)
    img += (np.sin(x * 25) * np.cos(y * 18))[..., None] * 8  # foliage
    return img


def _sky(size=256):
    y, x = _grid(size)
    return np.stack([120 + 80 * (1 - y), 160 + 60 * (1 - y),
                     230 * np.ones_like(y)], -1)


def _cup(size=256, cy=150, cx=120):
    body = _ellipse_mask(cy, cx, 55, 38, size)
    handle = _ellipse_mask(cy, cx + 48, 26, 18, size) & ~_ellipse_mask(
        cy, cx + 48, 14, 9, size)
    return body | handle


def _paint_cup(img, mask, size=256):
    _, x = _grid(size)
    cup_color = np.array([60, 90, 180], np.float32)
    shade = 1.0 - 0.5 * ((x - 120 / size * 1.0) ** 2)
    img = img.copy()
    img[mask] = (cup_color[None] * shade[mask][:, None]
                 + np.array([20, 20, 30]))
    return img


def _ball(size=256, cy=160, cx=128, r=48):
    return _ellipse_mask(cy, cx, r, r, size)


def _paint_ball(img, mask, size=256):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    img = img.copy()
    stripe = (np.sin((x + y) / 9.0) > 0)
    base = np.where(stripe[..., None], np.array([210, 60, 50]),
                    np.array([240, 230, 210]))
    img[mask] = base[mask]
    return img


def _bird(size=256, cy=130, cx=128):
    return (_ellipse_mask(cy, cx, 45, 60, size)
            | _ellipse_mask(cy - 35, cx + 42, 22, 26, size))


def _paint_bird(img, mask, size=256):
    y, _ = np.mgrid[0:size, 0:size].astype(np.float32)
    img = img.copy()
    stripes = (np.sin(y / 256 * 60) > 0)[..., None]
    img[mask] = np.where(
        stripes[mask], np.array([200, 120, 40]), np.array([90, 40, 20])
    )
    return img


def _tree(size=256, cy=120, cx=128):
    crown = _ellipse_mask(cy, cx, 60, 48, size)
    trunk = (np.abs(np.arange(size)[None, :] - cx) < 10) & (
        np.arange(size)[:, None] > cy
    ) & (np.arange(size)[:, None] < cy + 100)
    return crown | trunk


def _paint_tree(img, mask, size=256):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    img = img.copy()
    leaf = np.array([40, 120, 50], np.float32)
    tex = 1.0 + 0.15 * np.sin(x / 5.0) * np.cos(y / 7.0)
    img[mask] = np.clip(leaf[None] * tex[mask][:, None], 0, 255)
    return img


# -- task emitters -----------------------------------------------------------


def editing_2d():
    img = _paint_cup(_table(), _cup())
    _save("Editing/2D/cup/source.png", np.clip(img, 0, 255))
    _save("Editing/2D/cup/source_mask.png", _cup().astype(np.uint8) * 255)
    img2 = _paint_ball(_field(), _ball())
    _save("Editing/2D/ball/source.png", np.clip(img2, 0, 255))
    _save("Editing/2D/ball/source_mask.png", _ball().astype(np.uint8) * 255)


def editing_3d():
    img = _paint_tree(_field(), _tree())
    _save("Editing/3D/tree/source.png", np.clip(img, 0, 255))
    _save("Editing/3D/tree/source_mask.png", _tree().astype(np.uint8) * 255)


def removal():
    img = _paint_ball(_table(tone=(110, 110, 130)), _ball(cy=140, cx=150))
    _save("Removal/ball/source.png", np.clip(img, 0, 255))
    _save("Removal/ball/source_mask.png",
          _ball(cy=140, cx=150).astype(np.uint8) * 255)
    img2 = _paint_cup(_table(), _cup())
    _save("Removal/cup/source.png", np.clip(img2, 0, 255))
    _save("Removal/cup/source_mask.png", _cup().astype(np.uint8) * 255)


def appearance():
    app = _paint_bird(_sky(), _bird())
    _save("Appearance/bird/app.png", np.clip(app, 0, 255))
    _save("Appearance/bird/app_mask.png", _bird().astype(np.uint8) * 255)
    bg = _field()
    bird2 = _bird(cy=150, cx=110)
    bg2 = bg.copy()
    bg2[bird2] = np.array([150, 150, 150])
    _save("Appearance/bird/ori.png", np.clip(bg2, 0, 255))
    _save("Appearance/bird/ori_mask.png", bird2.astype(np.uint8) * 255)
    # legacy flat names used by older scripts / notebooks
    _save("bird_app.png", np.clip(app, 0, 255))
    _save("bird_app_mask.png", _bird().astype(np.uint8) * 255)
    _save("bird_bg.png", np.clip(bg2, 0, 255))
    _save("bird_bg_mask.png", bird2.astype(np.uint8) * 255)


def compose():
    src = _paint_ball(_sky(), _ball(cy=128, cx=128))
    _save("Compose/pair1/source.png", np.clip(src, 0, 255))
    _save("Compose/pair1/source_mask.png",
          _ball(cy=128, cx=128).astype(np.uint8) * 255)
    tgt = _table(tone=(120, 130, 110))
    region = _ball(cy=150, cx=140, r=52)
    _save("Compose/pair1/target.png", np.clip(tgt, 0, 255))
    _save("Compose/pair1/target_mask.png", region.astype(np.uint8) * 255)


def partial_editing():
    """Structure completion: a cup whose handle is missing; the partial
    mask marks the region to synthesise (reference
    Examples/Partial-Editing/<n>/{ori, full_mask, partial_mask_0})."""
    full = _cup()
    handle = _ellipse_mask(150, 168, 26, 18) & ~_ellipse_mask(150, 168, 14, 9)
    body_only = full & ~handle
    img = _paint_cup(_table(), body_only)
    _save("Partial-Editing/cup/ori.png", np.clip(img, 0, 255))
    _save("Partial-Editing/cup/full_mask.png", full.astype(np.uint8) * 255)
    _save("Partial-Editing/cup/partial_mask_0.png",
          handle.astype(np.uint8) * 255)


def legacy():
    img = _paint_cup(_table(), _cup())
    _save("cup.png", np.clip(img, 0, 255))
    _save("cup_mask.png", _cup().astype(np.uint8) * 255)


if __name__ == "__main__":
    legacy()
    editing_2d()
    editing_3d()
    removal()
    appearance()
    compose()
    partial_editing()
