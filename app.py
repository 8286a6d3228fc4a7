"""Gradio frontend: interactive object removal / geometric editing.

Rebuilds the reference app (/root/reference/app.py:1-63 +
src/demo/demo.py:157-257 + src/demo/utils.py): a tabbed Blocks UI with
click-to-box EfficientSAM segmentation, brush masks, and the removal /
editing runners wired to the TPU pipelines (the reference's runners are
`pass` stubs, src/demo/model.py:88-102 — these are implemented).

Requires `gradio` (not bundled in minimal images): `pip install gradio`.
Run: python app.py [--checkpoint /path/to/sd15] [--sam /path/to/sam.safetensors]
"""

from __future__ import annotations

import argparse
import functools

import numpy as np


def build_pipeline(checkpoint=None, tiny=False):
    from freefine_tpu.config import sd15_pipeline_config, tiny_pipeline_config
    from freefine_tpu.pipeline import FreeFine

    cfg = tiny_pipeline_config() if tiny else sd15_pipeline_config()
    pipe = FreeFine(
        config=cfg, init_random=checkpoint is None,
        tokenizer_path=checkpoint and f"{checkpoint}/tokenizer",
    )
    if checkpoint:
        from freefine_tpu.weights import load_sd15

        pipe.params = load_sd15(pipe, checkpoint)
    return pipe


def re_compose(app_img, app_mask, bg_img, region_mask) -> np.ndarray:
    """Center-aligned coarse paste of the appearance object into the target
    region (the reference Appearance_transfer.ipynb re_compose cell): crop
    the object's bbox, center it on the region's bbox center, hard-paste."""
    app_img = np.asarray(app_img)
    bg = np.asarray(bg_img).copy()
    am = np.asarray(app_mask)
    if am.ndim == 3:
        am = am[..., 0]
    rm = np.asarray(region_mask)
    if rm.ndim == 3:
        rm = rm[..., 0]
    ys, xs = np.nonzero(am > 0)
    rys, rxs = np.nonzero(rm > 0)
    if len(ys) == 0 or len(rys) == 0:
        return bg
    y0, y1, x0, x1 = ys.min(), ys.max(), xs.min(), xs.max()
    cy, cx = int(rys.mean()), int(rxs.mean())
    h, w = y1 - y0 + 1, x1 - x0 + 1
    ty0 = np.clip(cy - h // 2, 0, bg.shape[0] - h)
    tx0 = np.clip(cx - w // 2, 0, bg.shape[1] - w)
    crop = app_img[y0:y1 + 1, x0:x1 + 1]
    cm = (am[y0:y1 + 1, x0:x1 + 1] > 0)[..., None]
    region = bg[ty0:ty0 + h, tx0:tx0 + w]
    bg[ty0:ty0 + h, tx0:tx0 + w] = np.where(cm, crop, region)
    return bg


def draw_points_box(image: np.ndarray, points) -> np.ndarray:
    """Overlay click markers (and the box once two corners exist) on a copy
    of the image (reference show_point_or_box, src/demo/utils.py)."""
    img = np.asarray(image).copy()
    h, w = img.shape[:2]
    color = np.array([255, 0, 0], img.dtype)

    def mark(x, y, r=4):
        img[max(y - r, 0): y + r + 1, max(x - r, 0): x + r + 1] = color

    for x, y in points:
        mark(int(x), int(y))
    if len(points) == 2:
        (x0, y0), (x1, y1) = points
        x0, x1 = sorted((int(x0), int(x1)))
        y0, y1 = sorted((int(y0), int(y1)))
        x0, x1 = np.clip([x0, x1], 0, w - 1)
        y0, y1 = np.clip([y0, y1], 0, h - 1)
        img[y0, x0:x1 + 1] = color
        img[y1, x0:x1 + 1] = color
        img[y0:y1 + 1, x0] = color
        img[y0:y1 + 1, x1] = color
    return img


class FreeFineApp:
    """UI callbacks (reference src/demo/utils.py:40-201)."""

    def __init__(self, pipe, sam=None, sam_params=None):
        self.pipe = pipe
        self.sam = sam
        self.sam_params = sam_params

    def segment_with_points(self, image, points):
        """Two clicks -> box prompt -> EfficientSAM mask
        (src/demo/utils.py:40-100)."""
        if self.sam is None:
            raise RuntimeError("EfficientSAM weights not loaded (--sam)")
        from freefine_tpu.models.efficient_sam import segment_with_box

        (x0, y0), (x1, y1) = points[-2], points[-1]
        xyxy = (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
        return segment_with_box(self.sam, self.sam_params, image, xyxy)

    def on_click(self, image, points, x, y):
        """Click-collection state machine (reference segment_with_points,
        src/demo/utils.py:40-100): first click stores a box corner, the
        second closes the box and segments, a third starts a new box.

        Returns (overlay image, new point state, mask-or-None)."""
        points = list(points or [])
        if len(points) >= 2:
            points = []
        points.append((int(x), int(y)))
        mask = None
        if len(points) == 2:
            mask = self.segment_with_points(image, points)
            mask = (np.asarray(mask) > 0).astype(np.uint8) * 255
        return draw_points_box(image, points), points, mask

    def run_remove(self, image, mask, prompt, guidance_scale=3.5, eta=1.0,
                   num_step=50, seed=42):
        from freefine_tpu.masks import dilate
        import jax.numpy as jnp

        dil = np.asarray(dilate(jnp.asarray((mask > 0).astype(np.float32)), 30))
        return self.pipe.background_generation(
            image, (dil * 255).astype(np.uint8),
            prompt or "an empty scene",
            guidance_scale=guidance_scale, eta=eta,
            num_step=num_step, start_step=1, seed=seed,
        )

    def run_edit(self, image, mask, prompt, dx=0.0, dy=0.0, rotation=0.0,
                 scale=1.0, guidance_scale=7.5, eta=1.0, num_step=50,
                 start_step=35, seed=42):
        from freefine_tpu.ops.geometry import re_edit_2d

        coarse, tgt_mask, _ = re_edit_2d(
            image, mask, dx=dx, dy=dy, rotation=rotation,
            scale_x=scale, scale_y=scale,
        )
        return self.pipe.generation(
            image, mask, coarse, tgt_mask, prompt,
            guidance_scale=guidance_scale, eta=eta,
            num_step=num_step, start_step=start_step,
            use_auto_draw=True, cons_area=np.zeros_like(mask),
            reduce_inp_artifacts=True, seed=seed,
        )

    def run_compose(self, app_img, app_mask, bg_img, bg_mask, region_mask,
                    coarse=None, prompt="object", num_step=50, start_step=15,
                    seed=42):
        if coarse is None:
            coarse = re_compose(app_img, app_mask, bg_img, region_mask)
        return self.pipe.cross_image_composition(
            [app_img, bg_img], [app_mask, bg_mask], [region_mask], coarse,
            [prompt], appearance_transfer=True,
            num_step=num_step, start_step=start_step, seed=seed,
        )

    def run_complete(self, image, full_mask, draw_mask, prompt,
                     guidance_scale=7.5, eta=1.0, num_step=50,
                     start_step=25, seed=42):
        """Structure completion (sc_vis.ipynb / Partial-Editing): the
        draw mask marks the missing region to synthesise; the coarse
        input is the image itself."""
        return self.pipe.generation(
            image, full_mask, image, full_mask, prompt,
            guidance_scale=guidance_scale, eta=eta,
            num_step=num_step, start_step=start_step,
            end_step=max(1, num_step // 5),
            draw_mask=draw_mask, use_auto_draw=False, seed=seed,
        )


ASSETS = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "examples", "assets",
)


def _examples(*names):
    import os

    paths = [os.path.join(ASSETS, n) for n in names]
    return [paths] if all(os.path.exists(p) for p in paths) else None


def _task_examples(task: str, *files):
    """All example rows for one task directory of the per-task asset tree
    (examples/assets/<task>/<name>/<file> — the reference's Examples/
    layout, make_assets.py)."""
    import os

    base = os.path.join(ASSETS, *task.split("/"))
    rows = []
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            paths = [os.path.join(base, name, f) for f in files]
            if all(os.path.exists(p) for p in paths):
                rows.append(paths)
    return rows or None


def _click_to_mask(app):
    """Shared click-to-box SAM wiring for a tab; returns the mask image."""
    import gradio as gr

    def handler(image, points, evt: gr.SelectData):
        overlay, points, mask = app.on_click(
            image, points, evt.index[0], evt.index[1]
        )
        return overlay, points, mask

    return handler


def create_demo(app: FreeFineApp):
    import gradio as gr

    click = _click_to_mask(app)

    with gr.Blocks() as demo:
        gr.Markdown("## FreeFine-TPU — training-free geometric image editing")
        gr.Markdown(
            "Masks: upload one, or click two box corners on the input image "
            "(EfficientSAM segments the box; third click starts over)."
        )
        with gr.Tab("Object Removal"):
            src = gr.State(value=None)
            pts = gr.State([])
            with gr.Row():
                img = gr.Image(label="Input (click twice for SAM box)",
                               type="numpy")
                msk = gr.Image(label="Mask", type="numpy", image_mode="L")
                out = gr.Image(label="Result")
            prompt = gr.Textbox(label="Prompt", value="an empty scene")
            gscale = gr.Slider(1.1, 10.0, 3.5, label="guidance scale")
            img.upload(lambda i: (i, []), [img], [src, pts])
            img.select(
                lambda i, s, p, evt: app.on_click(
                    s if s is not None else i, p, evt.index[0], evt.index[1]
                ),
                [img, src, pts], [img, pts, msk],
            )
            btn = gr.Button("Remove")
            btn.click(
                lambda i, s, m, p, g: app.run_remove(
                    s if s is not None else i, m, p, guidance_scale=g
                ),
                [img, src, msk, prompt, gscale], out,
            )
            ex = (_task_examples("Removal", "source.png", "source_mask.png")
                  or _examples("cup.png", "cup_mask.png"))
            if ex:
                gr.Examples(examples=ex, inputs=[img, msk])
        with gr.Tab("Geometric Edit"):
            src2 = gr.State(value=None)
            pts2 = gr.State([])
            with gr.Row():
                img2 = gr.Image(label="Input (click twice for SAM box)",
                                type="numpy")
                msk2 = gr.Image(label="Mask", type="numpy", image_mode="L")
                out2 = gr.Image(label="Result")
            prompt2 = gr.Textbox(label="Prompt")
            with gr.Row():
                dx = gr.Slider(-200, 200, 0, label="dx")
                dy = gr.Slider(-200, 200, 0, label="dy")
                rot = gr.Slider(-90, 90, 0, label="rotation")
                sc = gr.Slider(0.3, 3.0, 1.0, label="scale")
            img2.upload(lambda i: (i, []), [img2], [src2, pts2])
            img2.select(
                lambda i, s, p, evt: app.on_click(
                    s if s is not None else i, p, evt.index[0], evt.index[1]
                ),
                [img2, src2, pts2], [img2, pts2, msk2],
            )
            btn2 = gr.Button("Edit")
            btn2.click(
                lambda i, s, m, p, a, b, r, c: app.run_edit(
                    s if s is not None else i, m, p,
                    dx=a, dy=b, rotation=r, scale=c,
                ),
                [img2, src2, msk2, prompt2, dx, dy, rot, sc], out2,
            )
            ex2 = (_task_examples("Editing/2D", "source.png",
                                  "source_mask.png")
                   or _examples("cup.png", "cup_mask.png"))
            if ex2:
                gr.Examples(examples=ex2, inputs=[img2, msk2])
        with gr.Tab("Compose / Appearance Transfer"):
            gr.Markdown(
                "Transfer the appearance image's object into the background "
                "region (reference Appearance_transfer.ipynb; coarse input "
                "defaults to a center-aligned paste)."
            )
            with gr.Row():
                a_img = gr.Image(label="Appearance image", type="numpy")
                a_msk = gr.Image(label="Appearance mask", type="numpy",
                                 image_mode="L")
            with gr.Row():
                b_img = gr.Image(label="Background image", type="numpy")
                b_msk = gr.Image(label="Background object mask", type="numpy",
                                 image_mode="L")
            with gr.Row():
                region = gr.Image(label="Target region mask (optional; "
                                  "defaults to the background mask)",
                                  type="numpy", image_mode="L")
                coarse3 = gr.Image(label="Coarse input (optional)",
                                   type="numpy")
                out3 = gr.Image(label="Result")
            prompt3 = gr.Textbox(label="Object prompt", value="object")
            btn3 = gr.Button("Compose")
            btn3.click(
                lambda ai, am, bi, bm, rm, co, p: app.run_compose(
                    ai, am, bi, bm,
                    rm if rm is not None else bm, co, p,
                ),
                [a_img, a_msk, b_img, b_msk, region, coarse3, prompt3], out3,
            )
            ex3 = (_task_examples("Appearance", "app.png", "app_mask.png",
                                  "ori.png", "ori_mask.png")
                   or _examples("bird_app.png", "bird_app_mask.png",
                                "bird_bg.png", "bird_bg_mask.png"))
            comp = _task_examples("Compose", "source.png", "source_mask.png",
                                  "target.png", "target_mask.png")
            if comp:
                ex3 = (ex3 or []) + comp
            if ex3:
                gr.Examples(examples=ex3,
                            inputs=[a_img, a_msk, b_img, b_msk])
        with gr.Tab("Structure Completion"):
            gr.Markdown(
                "Complete a partially visible object: the full mask covers "
                "the intended complete structure, the draw mask marks the "
                "missing region to synthesise (reference sc_vis.ipynb / "
                "Examples/Partial-Editing)."
            )
            with gr.Row():
                c_img = gr.Image(label="Input", type="numpy")
                c_full = gr.Image(label="Full structure mask",
                                  type="numpy", image_mode="L")
                c_draw = gr.Image(label="Draw mask (missing part)",
                                  type="numpy", image_mode="L")
            with gr.Row():
                out4 = gr.Image(label="Result")
            prompt4 = gr.Textbox(label="Prompt", value="a complete object")
            btn4 = gr.Button("Complete")
            btn4.click(
                lambda i, f, d, p: app.run_complete(i, f, d, p),
                [c_img, c_full, c_draw, prompt4], out4,
            )
            ex4 = _task_examples("Partial-Editing", "ori.png",
                                 "full_mask.png", "partial_mask_0.png")
            if ex4:
                gr.Examples(examples=ex4, inputs=[c_img, c_full, c_draw])
    return demo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is required for the UI: pip install gradio")

    pipe = build_pipeline(args.checkpoint, tiny=args.tiny)
    demo = create_demo(FreeFineApp(pipe))
    demo.queue(default_concurrency_limit=3)  # reference app.py:61
    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
