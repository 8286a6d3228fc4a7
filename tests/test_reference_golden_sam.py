"""Golden tests for EfficientSAM against the reference's OWN vendored
torch model (/root/reference/sam/efficient_sam/ — pure torch/numpy,
reviewed before import).

A tiny EfficientSam is instantiated from the reference's real classes,
all its parameters randomised, its state dict run through
`weights.convert_efficient_sam`, and our Flax model compared end-to-end:
image encoder (incl. the torch-convention bicubic pos-embed
interpolation, get_abs_pos at efficient_sam_encoder.py:143-175), prompt
encoder, mask decoder (two-way transformer + convT upscaling + 2-layer
hypernetwork MLPs, efficient_sam_decoder.py:139-330), and the full
predict path with point rescale/pad/truncate and IoU sorting
(efficient_sam.py:57-226).

Writing this suite surfaced and fixed two real deviations:
  * our hypernetwork MLPs had ONE hidden layer; the reference hardcodes
    num_layers=2 (efficient_sam_decoder.py:201-212), so the published
    vits/vitt checkpoints would not even have loaded;
  * pos-embed interpolation used jax.image.resize's a=-0.5 bicubic;
    torch's A=-0.75 kernel differs by ~10% relative (now
    ops/resize.interpolate_bicubic, pinned below).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from freefine_tpu import weights as W
from freefine_tpu.models.efficient_sam import EfficientSAM, EfficientSAMConfig
from freefine_tpu.ops.resize import interpolate_bicubic

REF_ROOT = "/root/reference"


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((14, 14), (64, 64)), ((14, 14), (4, 4)), ((7, 10), (33, 21)),
     ((5, 5), (5, 5)), ((256, 256), (64, 64))],
)
def test_interpolate_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic", align_corners=False
    ).numpy()
    got = interpolate_bicubic(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-6
    )


@pytest.fixture(scope="module")
def ref_sam():
    sys.path.insert(0, REF_ROOT)
    try:
        from sam.efficient_sam.efficient_sam import EfficientSam
        from sam.efficient_sam.efficient_sam_decoder import (
            MaskDecoder, PromptEncoder)
        from sam.efficient_sam.efficient_sam_encoder import ImageEncoderViT
        from sam.efficient_sam.two_way_transformer import TwoWayTransformer
    finally:
        sys.path.remove(REF_ROOT)
    from torch import nn

    torch.manual_seed(0)
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, in_chans=3, patch_embed_dim=32,
        normalization_type="layer_norm", depth=2, num_heads=2,
        mlp_ratio=2.0, neck_dims=[16, 16], act_layer=nn.GELU,
    )
    dec = MaskDecoder(
        transformer_dim=16,
        transformer=TwoWayTransformer(
            depth=2, embedding_dim=16, num_heads=2, mlp_dim=32,
            activation=nn.GELU, normalize_before_activation=False,
        ),
        num_multimask_outputs=3, activation=nn.GELU,
        normalization_type="layer_norm", normalize_before_activation=False,
        iou_head_depth=2, iou_head_hidden_dim=16, upscaling_layer_dims=[8, 4],
    )
    pe = PromptEncoder(
        embed_dim=16, image_embedding_size=(4, 4), input_image_size=(64, 64)
    )
    sam = EfficientSam(
        image_encoder=enc, prompt_encoder=pe,
        decoder_max_num_input_points=6, mask_decoder=dec,
    ).eval()
    # randomise EVERY parameter (incl. the zero-init pos_embed and the
    # ones/zeros norms) so any layout/transpose error shows up
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in sam.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    return sam


TINY = EfficientSAMConfig(
    img_size=64, patch_size=16, patch_embed_dim=32, depth=2, num_heads=2,
    mlp_ratio=2.0, neck_dim=16, decoder_depth=2, decoder_mlp_dim=32,
    decoder_heads=2, upscaling_dims=(8, 4), iou_hidden_dim=16,
)


@pytest.fixture(scope="module")
def ours(ref_sam):
    model = EfficientSAM(TINY)
    import jax

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 1, 2, 2)),
        jnp.zeros((1, 1, 2)),
    )
    tensors = {k: v.numpy() for k, v in ref_sam.state_dict().items()}
    params = W.convert_efficient_sam(params, tensors)
    return model, params


def test_converter_consumes_every_reference_tensor(ref_sam, ours):
    """Count coverage: every torch tensor must have a flax destination
    (buffers pixel_mean/std excepted — they are constants in our model)."""
    import jax

    sd = {k for k in ref_sam.state_dict() if not k.startswith("pixel_")}
    n_leaves = len(jax.tree_util.tree_leaves(ours[1]))
    assert len(sd) == n_leaves


def test_image_encoder_golden(ref_sam, ours):
    model, params = ours
    rng = np.random.RandomState(2)
    img = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref_sam.get_image_embeddings(torch.from_numpy(img)).numpy()
    got = model.apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=EfficientSAM.embed_image,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
    )


def test_prompt_encoder_golden(ref_sam, ours):
    model, params = ours
    rng = np.random.RandomState(3)
    pts = (rng.rand(4, 6, 2) * 64).astype(np.float32)
    lbl = rng.choice([-1.0, 1.0, 2.0, 3.0], size=(4, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref_sam.prompt_encoder(
            torch.from_numpy(pts), torch.from_numpy(lbl)
        ).numpy()

    def run(p, pts, lbl):
        return p.prompt_encoder(pts, lbl)

    got = model.apply(params, jnp.asarray(pts), jnp.asarray(lbl), method=run)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("n_pts", [3, 6, 9])
def test_full_forward_golden(ref_sam, ours, n_pts):
    """End-to-end masks+IoU parity at low res across the pad (n<6),
    exact (n=6) and truncate (n>6) prompt paths, incl. IoU sorting."""
    model, params = ours
    rng = np.random.RandomState(10 + n_pts)
    img = rng.rand(2, 3, 48, 56).astype(np.float32)  # non-square input
    pts = (rng.rand(2, 2, n_pts, 2) * 48).astype(np.float32)
    lbl = rng.choice([1.0, 2.0, 3.0], size=(2, 2, n_pts)).astype(np.float32)
    lbl[0, 0, -1] = -1.0  # one padded point
    with torch.no_grad():
        want_m, want_iou = ref_sam(
            torch.from_numpy(img), torch.from_numpy(pts),
            torch.from_numpy(lbl), scale_to_original_image_size=False,
        )
    got_m, got_iou = model.apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(pts),
        jnp.asarray(lbl),
    )
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(), atol=2e-4)


def test_upscaled_output_golden(ref_sam, ours):
    """scale_to_original_image_size=True path: the reference bicubic-
    upsamples low-res masks to the input size before sorting; ours sorts
    low-res and upsamples with interpolate_bicubic — same result."""
    model, params = ours
    rng = np.random.RandomState(42)
    img = rng.rand(1, 3, 40, 40).astype(np.float32)
    pts = (rng.rand(1, 1, 2, 2) * 40).astype(np.float32)
    lbl = np.asarray([[[2.0, 3.0]]], np.float32)
    with torch.no_grad():
        want_m, want_iou = ref_sam(
            torch.from_numpy(img), torch.from_numpy(pts),
            torch.from_numpy(lbl), scale_to_original_image_size=True,
        )
    got_m, got_iou = model.apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(pts),
        jnp.asarray(lbl),
    )
    up = interpolate_bicubic(
        jnp.asarray(got_m)[0, 0].transpose(1, 2, 0), (40, 40)
    ).transpose(2, 0, 1)[None, None]
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(up), want_m.numpy().reshape(1, 1, -1, 40, 40), atol=2e-4
    )
