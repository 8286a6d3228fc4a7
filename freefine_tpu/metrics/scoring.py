"""Preference scores: HPS (OpenCLIP ViT-H cosine) and the IRS interface.

HPS (reference evaluation/metrics/human_preference_score.py:40-83): per
image, diag(image_features @ text_features.T) with the GPT-4V caption as
text, both feature sets L2-normalised — averaged over all cases.

IRS (image_reward.py:6-35): ImageReward-v1.0 (BLIP backbone + MLP head) is
hosted by `models/blip.ImageReward` (torch-parity-tested,
tests/test_hf_parity.py) through `weights.convert_blip_image_reward`;
`make_irs_scorer` builds the jitted scorer.  HPS weights load via
`weights.load_hps` (open_clip ViT-H checkpoint -> both towers).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def hps_single(
    img: np.ndarray, prompt: str,
    encode_image: Callable[[np.ndarray], np.ndarray],
    encode_text: Callable[[str], np.ndarray],
) -> float:
    fi = np.asarray(encode_image(img), np.float64)
    ft = np.asarray(encode_text(prompt), np.float64)
    fi = fi / max(np.linalg.norm(fi), 1e-12)
    ft = ft / max(np.linalg.norm(ft), 1e-12)
    return float(fi @ ft)


def hps(data: Dict, image_label: str, encode_image, encode_text) -> float:
    """Average HPS over the results JSON; prompt = the per-image
    '4v_caption' (human_preference_score.py:66-80)."""
    from PIL import Image

    total, num = 0.0, 0
    for image in data.values():
        prompt = image.get("4v_caption", "")
        for instance in image["instances"].values():
            for sample in instance.values():
                img = np.array(Image.open(sample[image_label]).convert("RGB"))
                p = prompt or sample.get("4v_caption", "")
                total += hps_single(img, p, encode_image, encode_text)
                num += 1
    return total / max(num, 1)


def make_hps_encoders(image_params, text_params, tokenizer):
    """Jitted (encode_image, encode_text) from converted HPSv2.1 weights."""
    import jax
    import jax.numpy as jnp

    from freefine_tpu.metrics.preprocess import clip_image_transform
    from freefine_tpu.models.clip_image import CLIPImageEncoder, clip_vit_h14
    from freefine_tpu.models.open_clip_text import OpenCLIPText, open_clip_text_h14

    img_model = CLIPImageEncoder(clip_vit_h14())
    txt_model = OpenCLIPText(open_clip_text_h14())
    img_apply = jax.jit(lambda p, x: img_model.apply(p, x))
    txt_apply = jax.jit(lambda p, i: txt_model.apply(p, i))

    def encode_image(img):
        # hpsv2's open_clip preprocess_val == the OpenAI CLIP transform
        # at 224² (human_preference_score.py:12-29) — PIL-backed host path
        x = jnp.asarray(clip_image_transform(img))
        return np.asarray(img_apply(image_params, x))[0]

    def encode_text(prompt):
        ids = jnp.asarray(tokenizer.encode(prompt))[None]
        return np.asarray(txt_apply(text_params, ids))[0]

    return encode_image, encode_text


def make_irs_scorer(params, tokenizer=None):
    """Jitted ImageReward scorer from converted BLIP params
    (freefine_tpu.models.blip.ImageReward)."""
    import jax
    import jax.numpy as jnp

    from freefine_tpu.metrics.preprocess import clip_image_transform
    from freefine_tpu.models.blip import (
        BlipConfig,
        HashWordTokenizer,
        ImageReward,
    )

    model = ImageReward(BlipConfig())
    tok = tokenizer or HashWordTokenizer()
    apply = jax.jit(lambda p, im, ids, m: model.apply(p, im, ids, m))

    def score(img: np.ndarray, prompt: str) -> float:
        # ImageReward-v1.0 preprocesses with the OpenAI CLIP transform
        # (`_transform(224)`: BICUBIC short-side resize + center crop +
        # CLIP-constant norm) — PIL-backed host path
        x = jnp.asarray(clip_image_transform(img))
        ids, mask = tok.encode(prompt)
        return float(apply(params, x, jnp.asarray(ids)[None],
                           jnp.asarray(mask)[None])[0])

    return score


def irs(data: Dict, image_label: str, score) -> float:
    """Average ImageReward over the results JSON (image_reward.py:6-35):
    per top-level image the GPT-4V caption scores every generated case."""
    from PIL import Image

    total, num = 0.0, 0
    for image in data.values():
        prompt = image.get("4v_caption", "")
        for instance in image["instances"].values():
            for sample in instance.values():
                img = np.array(Image.open(sample[image_label]).convert("RGB"))
                total += score(img, prompt or sample.get("4v_caption", ""))
                num += 1
    return total / max(num, 1)
