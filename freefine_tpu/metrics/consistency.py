"""BGC / SUBC consistency metrics (reference evaluation/metrics/VBench/).

  * BGC: CLIP ViT-B/32 cosine similarity of source vs edited image with the
    union of src+tgt masks blanked out (background_consistency.py:18-49).
  * SUBC: DINO ViT-B/16 cosine similarity of masked subject crops
    (subject_consistency.py:10-43).

Both take a pluggable `encode(img_uint8) -> [D]` feature function so the
metric math is testable without checkpoints; `make_clip_encoder` /
`make_dino_encoder` build jitted on-device encoders from converted weights.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    a = a / max(np.linalg.norm(a), 1e-12)
    b = b / max(np.linalg.norm(b), 1e-12)
    return float(max(0.0, float(a @ b)))


def _resize_mask(mask: np.ndarray, hw) -> np.ndarray:
    from PIL import Image

    return np.array(
        Image.fromarray(np.asarray(mask).astype(np.uint8)).resize(
            (hw[1], hw[0]), Image.BILINEAR
        )
    )


def background_consistency_single(
    src_img: np.ndarray, gen_img: np.ndarray,
    src_mask: np.ndarray, tgt_mask: np.ndarray,
    encode: Callable[[np.ndarray], np.ndarray],
) -> float:
    """Blank the union of masks (threshold: src+tgt < 128 keeps background,
    background_consistency.py:21-27), encode, cosine."""
    m1 = _resize_mask(src_mask, src_img.shape[:2]).astype(np.int32)
    m2 = _resize_mask(tgt_mask, src_img.shape[:2]).astype(np.int32)
    keep = ((m1 + m2) < 128).astype(np.uint8)
    a = encode(src_img * keep[..., None])
    b = encode(gen_img * keep[..., None])
    return _cos(np.asarray(a), np.asarray(b))


def subject_consistency_single(
    src_img: np.ndarray, gen_img: np.ndarray,
    src_mask: np.ndarray, tgt_mask: np.ndarray,
    encode: Callable[[np.ndarray], np.ndarray],
) -> float:
    """Keep only the masked subject in each image (> 128,
    subject_consistency.py:18-23), encode, cosine."""
    m1 = (_resize_mask(src_mask, src_img.shape[:2]) > 128).astype(np.uint8)
    m2 = (_resize_mask(tgt_mask, gen_img.shape[:2]) > 128).astype(np.uint8)
    a = encode(src_img * m1[..., None])
    b = encode(gen_img * m2[..., None])
    return _cos(np.asarray(a), np.asarray(b))


def _iterate_pairs(data: Dict, image_label: str):
    from PIL import Image

    for image in data.values():
        for instance in image["instances"].values():
            for sample in instance.values():
                yield (
                    np.array(Image.open(sample["ori_img_path"]).convert("RGB")),
                    np.array(Image.open(sample[image_label]).convert("RGB")),
                    np.array(Image.open(sample["ori_mask_path"]).convert("L")),
                    np.array(Image.open(sample["tgt_mask_path"]).convert("L")),
                )


def background_consistency(data: Dict, image_label: str, encode) -> float:
    vals = [
        background_consistency_single(*pair, encode)
        for pair in _iterate_pairs(data, image_label)
    ]
    return float(np.mean(vals)) if vals else 0.0


def subject_consistency(data: Dict, image_label: str, encode) -> float:
    vals = [
        subject_consistency_single(*pair, encode)
        for pair in _iterate_pairs(data, image_label)
    ]
    return float(np.mean(vals)) if vals else 0.0


def make_clip_encoder(params) -> Callable[[np.ndarray], np.ndarray]:
    """Jitted CLIP ViT-B/32 image-feature fn from converted params."""
    import jax
    import jax.numpy as jnp

    from freefine_tpu.metrics.preprocess import clip_image_transform
    from freefine_tpu.models.clip_image import CLIPImageEncoder, clip_vit_b32

    model = CLIPImageEncoder(clip_vit_b32())
    apply = jax.jit(lambda p, x: model.apply(p, x))

    def encode(img: np.ndarray) -> np.ndarray:
        # PIL-backed host preprocess — bit-exact with clip.load's
        # transform (background_consistency.py:41)
        x = jnp.asarray(clip_image_transform(img))
        return np.asarray(apply(params, x))[0]

    return encode


def make_dino_encoder(params, config=None) -> Callable[[np.ndarray], np.ndarray]:
    """Jitted DINO ViT feature fn (cls token) from converted params.

    The reference uses DINO-v1 ViT-B/16 for SUBC; the same `DINOv2` module
    (patch 16, no-op LayerScale filled with ones at conversion) hosts those
    weights — load with `weights.load_dino_v1(params, "dino_vitb16_
    pretrain.pth")` (convert_dino_v1 is torch-parity-tested vs ViTModel,
    tests/test_hf_parity.py).  FID_DINO uses DINOv2 ViT-B/14
    (fid_dino.py:22-42, `weights.convert_dinov2`).
    """
    import jax
    import jax.numpy as jnp

    from freefine_tpu.models.dinov2 import DINOv2, DINOv2Config

    cfg = config or DINOv2Config(
        dim=768, depth=12, heads=12, patch_size=16, pos_embed_size=14
    )
    model = DINOv2(cfg)
    apply = jax.jit(lambda p, x: model.apply(p, x)[1])

    def encode(img: np.ndarray) -> np.ndarray:
        # PIL-backed host preprocess — the reference SUBC chain
        # (subject_consistency.py:11-15: Resize(224) BILINEAR + ImageNet
        # norm, no crop; GeoBench images are square so this is 224²)
        from freefine_tpu.metrics.preprocess import dino_subc_transform

        x = dino_subc_transform(img)
        return np.asarray(apply(params, jnp.asarray(x)))[0]

    return encode


def make_dino_batch_encoder(params, config=None):
    """(encode_batch, preprocess) pair for `fid.batched_features`: one jitted
    DINO forward per batch of 64 instead of per image (the FID_DINO/FID_KD
    path runs over thousands of GeoBench images)."""
    import jax
    import jax.numpy as jnp

    from freefine_tpu.models.dinov2 import DINOv2, DINOv2Config

    cfg = config or DINOv2Config(
        dim=768, depth=12, heads=12, patch_size=16, pos_embed_size=14
    )
    model = DINOv2(cfg)
    apply = jax.jit(lambda p, x: model.apply(p, x)[1])

    def encode_batch(batch: np.ndarray) -> np.ndarray:
        return np.asarray(apply(params, jnp.asarray(batch)))

    def prep_one(img: np.ndarray) -> np.ndarray:
        # the FID family's shared input chain (the reference's modified
        # FID/fid_score.py:124): Resize((224, 224)) BILINEAR + ImageNet
        # norm — PIL-backed for exact parity
        from freefine_tpu.metrics.preprocess import fid_input_transform

        return fid_input_transform(img)

    return encode_batch, prep_one
