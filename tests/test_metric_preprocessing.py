"""Metric-preprocessing parity tests (VERDICT r3 #6).

The reference metrics preprocess on the host with torchvision transforms
over PIL images.  torchvision/clip/open_clip are not installed here, but
their PIL backend is a thin wrapper over PIL ops — so
`freefine_tpu/metrics/preprocess.py` is PIL-backed, and these tests pin it
two ways:

  * against torch directly where the reference step IS a torch op: the
    FID InceptionV3's internal 299 upsample (pytorch-fid `resize_input` =
    `F.interpolate(bilinear, align_corners=False)`), compared against our
    in-model `jax.image.resize(..., antialias=False)`;
  * against independent reimplementations of the cited torchvision
    recipes (resize geometry via torchvision's size formula, normalise via
    torch tensors) for the CLIP / SUBC-DINO / FID input chains, including
    the non-square cases that distinguish short-side resize, center crop
    and square stretch.

Environment-blocked (documented, not tested): the HPS tokenizer vs
open_clip's SimpleTokenizer — neither open_clip nor its BPE vocab file
exists in this image; `models/tokenizer.py::CLIPTokenizer` loads the same
`bpe_simple_vocab_16e6.txt.gz` format when given one.
"""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

from freefine_tpu.metrics.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    clip_image_transform,
    dino_subc_transform,
    fid_input_transform,
)


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (h, w, 3), dtype=np.uint8
    )


# -- the torch-reachable step: pytorch-fid's in-model upsample --------------


def test_fid_inception_upsample_matches_torch_interpolate():
    """Our in-model 224->299 upsample == F.interpolate(bilinear,
    align_corners=False) — the pytorch-fid resize_input step the
    reference runs on every FID image (fid_score.py:124 feeds 224²)."""
    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(1).normal(size=(2, 224, 224, 3)).astype(
        np.float32
    )
    ours = jax.image.resize(
        jnp.asarray(x), (2, 299, 299, 3), method="bilinear", antialias=False
    )
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=(299, 299),
        mode="bilinear",
        align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_inception_model_upsamples_224_input():
    """InceptionV3FID accepts the reference's 224² feed and matches an
    explicit torch-interpolated 299² feed of the same tensor."""
    import jax
    import jax.numpy as jnp

    from freefine_tpu.models.inception import InceptionV3FID

    model = InceptionV3FID()
    x224 = np.random.default_rng(2).normal(
        size=(1, 224, 224, 3)
    ).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x224))
    out224 = model.apply(params, jnp.asarray(x224))
    x299 = torch.nn.functional.interpolate(
        torch.from_numpy(x224).permute(0, 3, 1, 2),
        size=(299, 299), mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    out299 = model.apply(params, jnp.asarray(x299))
    np.testing.assert_allclose(
        np.asarray(out224), np.asarray(out299), atol=2e-4
    )


# -- torchvision-recipe reimplementations ------------------------------------


def _tv_resize_short(img: Image.Image, size: int, resample):
    """torchvision.transforms.functional.resize(int) geometry."""
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return img
    new_short, new_long = size, int(size * long / short)
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((nw, nh), resample)


def _tv_center_crop(img: Image.Image, size: int):
    w, h = img.size
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def _tv_to_norm_tensor(img: Image.Image, mean, std):
    t = torch.from_numpy(np.asarray(img, np.uint8).copy()).float() / 255.0
    return (
        (t - torch.tensor(mean)) / torch.tensor(std)
    ).numpy()[None]


@pytest.mark.parametrize("hw", [(512, 512), (480, 640), (300, 224)])
def test_clip_transform_matches_openai_recipe(hw):
    """clip_image_transform == Resize(224, BICUBIC) + CenterCrop(224) +
    ToTensor + Normalize(CLIP constants) — the clip.load preprocess used
    by BGC/HPS/IRS (background_consistency.py:41)."""
    img = _rand_img(*hw, seed=3)
    ref = _tv_to_norm_tensor(
        _tv_center_crop(
            _tv_resize_short(Image.fromarray(img), 224, Image.BICUBIC), 224
        ),
        CLIP_MEAN, CLIP_STD,
    )
    np.testing.assert_array_equal(clip_image_transform(img), ref)
    assert ref.shape == (1, 224, 224, 3)


@pytest.mark.parametrize("hw", [(512, 512), (448, 336)])
def test_dino_transform_matches_subc_recipe(hw):
    """dino_subc_transform == Resize(224) default-BILINEAR + ToTensor +
    Normalize(ImageNet), NO crop (subject_consistency.py:11-15) —
    non-square inputs stay aspect-preserving."""
    img = _rand_img(*hw, seed=4)
    ref = _tv_to_norm_tensor(
        _tv_resize_short(Image.fromarray(img), 224, Image.BILINEAR),
        IMAGENET_MEAN, IMAGENET_STD,
    )
    np.testing.assert_array_equal(dino_subc_transform(img), ref)
    h, w = hw
    assert min(ref.shape[1:3]) == 224
    if h != w:  # aspect preserved: the long side scales past 224
        assert max(ref.shape[1:3]) == int(224 * max(h, w) / min(h, w))


def test_fid_input_transform_matches_fid_score_recipe():
    """fid_input_transform == Resize((224, 224)) square stretch BILINEAR +
    Normalize(ImageNet) (the reference's modified FID/fid_score.py:124)."""
    img = _rand_img(480, 640, seed=5)
    ref = _tv_to_norm_tensor(
        Image.fromarray(img).resize((224, 224), Image.BILINEAR),
        IMAGENET_MEAN, IMAGENET_STD,
    )
    out = fid_input_transform(img)
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (1, 224, 224, 3)  # stretch, not short-side


def test_square_stretch_vs_short_side_differ_on_rect():
    """Sanity: the two resize geometries genuinely differ on non-square
    inputs (guards against silently unifying them)."""
    img = _rand_img(300, 500, seed=6)
    assert fid_input_transform(img).shape != dino_subc_transform(img).shape


# -- the metric paths actually route through the PIL chain -------------------


def test_bgc_subc_use_pil_chain(monkeypatch):
    """make_clip_encoder / make_dino_encoder feed the encoders the exact
    PIL-transform output (spy on the jitted apply input)."""
    import jax
    import jax.numpy as jnp

    from freefine_tpu.metrics import consistency as C

    img = _rand_img(96, 96, seed=7)

    seen = {}

    def fake_jit(fn):
        def wrapped(p, x):
            seen["x"] = np.asarray(x)
            return jnp.zeros((x.shape[0], 8))

        return wrapped

    monkeypatch.setattr(jax, "jit", fake_jit)
    enc = C.make_clip_encoder(params={})
    enc(img)
    np.testing.assert_array_equal(seen["x"], clip_image_transform(img))

    enc = C.make_dino_encoder(params={})
    enc(img)
    np.testing.assert_array_equal(seen["x"], dino_subc_transform(img))
