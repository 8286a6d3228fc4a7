"""UI callback tests — gradio-free (the Blocks wiring needs gradio, but all
behaviour lives in FreeFineApp / module helpers, reference
src/demo/utils.py:40-201)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import app as app_mod  # repo-root app.py


class StubSam:
    """Records the box and returns a rectangle mask."""

    def __init__(self):
        self.boxes = []


def _app_with_stub_sam():
    a = app_mod.FreeFineApp.__new__(app_mod.FreeFineApp)
    a.pipe = None
    a.sam = StubSam()
    a.sam_params = None

    def seg(image, points):
        (x0, y0), (x1, y1) = points[-2], points[-1]
        a.sam.boxes.append((min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1)))
        m = np.zeros(image.shape[:2], np.uint8)
        m[min(y0, y1): max(y0, y1) + 1, min(x0, x1): max(x0, x1) + 1] = 255
        return m

    a.segment_with_points = seg
    return a


def test_on_click_state_machine():
    a = _app_with_stub_sam()
    img = np.zeros((64, 64, 3), np.uint8)

    # first click: marker only, no mask
    overlay, pts, mask = a.on_click(img, [], 10, 12)
    assert pts == [(10, 12)] and mask is None
    assert (overlay[12, 10] == [255, 0, 0]).all()

    # second click: box + SAM mask (corners normalised regardless of order)
    overlay, pts, mask = a.on_click(img, pts, 40, 30)
    assert len(pts) == 2 and mask is not None
    assert a.sam.boxes == [(10, 12, 40, 30)]
    assert mask[20, 20] == 255 and mask[5, 5] == 0

    # third click: resets to a fresh first corner
    overlay, pts, mask = a.on_click(img, pts, 50, 50)
    assert pts == [(50, 50)] and mask is None


def test_on_click_reverse_corners():
    a = _app_with_stub_sam()
    img = np.zeros((64, 64, 3), np.uint8)
    _, pts, _ = a.on_click(img, [], 40, 30)
    _, _, mask = a.on_click(img, pts, 10, 12)
    assert a.sam.boxes == [(10, 12, 40, 30)]
    assert mask[20, 20] == 255


def test_draw_points_box():
    img = np.zeros((32, 32, 3), np.uint8)
    out = app_mod.draw_points_box(img, [(5, 5), (20, 25)])
    assert (out[5, 5:21] == [255, 0, 0]).all(axis=-1).all()   # top edge
    assert (out[25, 5:21] == [255, 0, 0]).all(axis=-1).all()  # bottom edge
    assert (img == 0).all()  # original untouched


def test_re_compose_center_paste():
    app_img = np.zeros((64, 64, 3), np.uint8)
    app_img[10:20, 10:20] = 200
    am = np.zeros((64, 64), np.uint8)
    am[10:20, 10:20] = 255
    bg = np.full((64, 64, 3), 50, np.uint8)
    rm = np.zeros((64, 64), np.uint8)
    rm[40:50, 40:50] = 255
    out = app_mod.re_compose(app_img, am, bg, rm)
    assert (out[44, 44] == 200).all()   # object landed at the region center
    assert (out[5, 5] == 50).all()      # background untouched
    assert (bg[44, 44] == 50).all()     # input not mutated... (copy)


def test_example_assets_exist_and_align():
    import os.path as osp

    from PIL import Image

    for img_name, mask_name in [
        ("cup.png", "cup_mask.png"),
        ("bird_app.png", "bird_app_mask.png"),
        ("bird_bg.png", "bird_bg_mask.png"),
    ]:
        ip, mp = osp.join(app_mod.ASSETS, img_name), osp.join(
            app_mod.ASSETS, mask_name)
        assert osp.exists(ip) and osp.exists(mp), (ip, mp)
        img = np.asarray(Image.open(ip))
        mask = np.asarray(Image.open(mp))
        assert img.shape[:2] == mask.shape[:2]
        assert mask.max() == 255 and (np.unique(mask) <= 255).all()
        assert 0.01 < (mask > 0).mean() < 0.7  # a real object-sized mask


def test_run_compose_uses_default_coarse(monkeypatch):
    """With no coarse input the center-aligned paste feeds the pipeline."""
    calls = {}

    class StubPipe:
        def cross_image_composition(self, imgs, oms, tms, coarse, prompts,
                                    **kw):
            calls["coarse"] = coarse
            calls["prompts"] = prompts
            return coarse

    a = app_mod.FreeFineApp(StubPipe())
    app_img = np.zeros((32, 32, 3), np.uint8)
    app_img[4:10, 4:10] = 99
    am = np.zeros((32, 32), np.uint8); am[4:10, 4:10] = 255
    bg = np.full((32, 32, 3), 7, np.uint8)
    bm = np.zeros((32, 32), np.uint8); bm[20:28, 20:28] = 255
    out = a.run_compose(app_img, am, bg, bm, bm, None, "a bird")
    assert calls["prompts"] == ["a bird"]
    assert (out[23, 23] == 99).all()


def test_task_examples_tree():
    """The per-task asset tree populates every tab's example gallery."""
    from app import _task_examples

    rem = _task_examples("Removal", "source.png", "source_mask.png")
    e2d = _task_examples("Editing/2D", "source.png", "source_mask.png")
    e3d = _task_examples("Editing/3D", "source.png", "source_mask.png")
    ap = _task_examples("Appearance", "app.png", "app_mask.png",
                        "ori.png", "ori_mask.png")
    comp = _task_examples("Compose", "source.png", "source_mask.png",
                          "target.png", "target_mask.png")
    pe = _task_examples("Partial-Editing", "ori.png", "full_mask.png",
                        "partial_mask_0.png")
    assert rem and len(rem) >= 2
    assert e2d and len(e2d) >= 2
    assert e3d and ap and comp and pe
    import os.path as osp

    for rows in (rem, e2d, e3d, ap, comp, pe):
        for row in rows:
            assert all(osp.exists(p) for p in row)


def test_run_complete_wires_draw_mask(monkeypatch):
    """The SC tab runner routes draw_mask with use_auto_draw=False."""
    from app import FreeFineApp

    seen = {}

    class FakePipe:
        def generation(self, img, mask, coarse, tgt, prompt, **kw):
            seen.update(kw, prompt=prompt)
            return img

    app = FreeFineApp.__new__(FreeFineApp)
    app.pipe = FakePipe()
    img = np.zeros((8, 8, 3), np.uint8)
    m = np.zeros((8, 8), np.uint8)
    d = np.ones((8, 8), np.uint8)
    out = app.run_complete(img, m, d, "a cup", num_step=10)
    assert out is img
    assert seen["use_auto_draw"] is False
    assert seen["draw_mask"] is d
    assert seen["end_step"] == 2 and seen["prompt"] == "a cup"
