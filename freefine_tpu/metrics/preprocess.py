"""Host-side metric preprocessing — PIL-backed for exact parity with the
reference's torchvision/PIL transforms.

Every metric in the reference stack preprocesses on the host with
torchvision transforms applied to PIL images; torchvision's PIL backend is
a thin wrapper over `PIL.Image.resize` / crop + numpy scaling, so building
the same chain on PIL directly reproduces it bit-for-bit (uint8 resize
rounding included) without a torchvision dependency:

  * `clip_image_transform` — the OpenAI `clip.load` preprocess: BICUBIC
    resize of the short side to `size`, center crop, /255, CLIP-constant
    normalise.  Used by BGC (VBench/background_consistency.py:41), HPS
    (human_preference_score.py:12-29 -> hpsv2 open_clip `preprocess_val`,
    image_size 224, OpenAI mean/std) and IRS (ImageReward-v1.0's
    `_transform(224)`, identical chain).
  * `dino_subc_transform` — torchvision `Resize(224)` (short side, default
    BILINEAR) + ImageNet normalise, NO crop
    (VBench/subject_consistency.py:11-15).
  * `fid_input_transform` — torchvision `Resize((224, 224))` (square
    stretch, BILINEAR) + ImageNet normalise (the reference's own modified
    FID/fid_score.py:124) — shared by FID, FID_DINO, FID_KD and MMD; the
    Inception lane then upsamples to 299 INSIDE the model exactly like
    pytorch_fid's `resize_input` (F.interpolate bilinear,
    align_corners=False — golden-tested against torch in
    tests/test_metric_preprocessing.py).

All functions take uint8 RGB [H, W, 3] numpy arrays and return float32
numpy [1, h, w, 3] (NHWC) ready for the flax encoders.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _to_pil(img_uint8: np.ndarray) -> Image.Image:
    return Image.fromarray(np.ascontiguousarray(np.asarray(img_uint8, np.uint8))).convert(
        "RGB"
    )


def _resize_short_side(
    img: Image.Image, size: int, resample: int
) -> Image.Image:
    """torchvision Resize(int): scale the SHORT side to `size`, keep aspect
    (torchvision.transforms.functional.resize with an int size)."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        ow, oh = size, int(size * h / w)
    else:
        ow, oh = int(size * w / h), size
    return img.resize((ow, oh), resample)


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    """torchvision CenterCrop: round((dim - size) / 2) offsets."""
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def clip_image_transform(img_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """OpenAI CLIP preprocess (clip.load / ImageReward / hpsv2 eval chain)."""
    img = _to_pil(img_uint8)
    img = _resize_short_side(img, size, Image.BICUBIC)
    img = _center_crop(img, size)
    x = np.asarray(img, np.float32) / 255.0
    return ((x - CLIP_MEAN) / CLIP_STD)[None]


def dino_subc_transform(img_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """SUBC's DINO chain: Resize(224) BILINEAR + ImageNet normalise, no
    crop (subject_consistency.py:11-15).  Non-square inputs keep their
    aspect ratio, exactly like torchvision — callers that need a fixed
    token grid should pass square images (every GeoBench image is)."""
    img = _to_pil(img_uint8)
    img = _resize_short_side(img, size, Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    return ((x - IMAGENET_MEAN) / IMAGENET_STD)[None]


def fid_input_transform(img_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """The reference FID stack's shared input chain
    (FID/fid_score.py:122-124): Resize((224, 224)) square stretch BILINEAR
    + ImageNet normalise.  Feeds InceptionV3 (which upsamples to 299
    internally), dinov2_vitb14 (FID_DINO/FID_KD) and MMD alike."""
    img = _to_pil(img_uint8).resize((size, size), Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    return ((x - IMAGENET_MEAN) / IMAGENET_STD)[None]
