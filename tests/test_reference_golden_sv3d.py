"""Golden test: our SV3D VideoUNet vs the reference's OWN vendored sgm
implementation (/root/reference/generative-models/sgm/modules/
diffusionmodules/video_model.py, imported with pytorch_lightning/
omegaconf/kornia/open_clip stubbed; xformers deliberately NOT stubbed so
sgm's guarded import falls back to plain torch attention).

A tiny sgm ``VideoUNet`` is built with SV3D_p's structural switches
(num_classes="sequential", use_spatial_context, extra_ff_mix_layer,
merge_strategy="learned_with_images", video_kernel_size=[3,1,1],
use_linear_in_transformer), all parameters randomised, its real state
dict run through ``weights_sv3d.convert_sv3d_unet``, and the two
forwards compared at float32.

Writing this test surfaced and fixed THREE real deviations (each
invisible to the converter roundtrip test, which synthesised the sgm
layout from our own tree):
  * AlphaBlender blended in the wrong direction (a*temporal vs the
    reference's a*x_spatial + (1-a)*x_temporal, sgm util.py:388-399);
  * the temporal ResBlock's GroupNorms computed per-frame statistics,
    but torch normalises the 5-D [B, C, T, H, W] tensor — stats joint
    over (C/g, T, H, W);
  * the stride-2 downsample conv used SAME padding ((0,1) at even
    sizes) where torch pads (1,1) — this one also affected the main
    SD UNet's Downsample (models/layers.py).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from freefine_tpu import weights_sv3d as WS
from freefine_tpu.models.video_unet import VideoUNet, VideoUNetConfig
from tests.golden_stubs import make_module, override

SGM_ROOT = "/root/reference/generative-models"

T = 3  # frames


@pytest.fixture(scope="module")
def ref_net():
    stubs = {
        "pytorch_lightning": make_module(
            "pytorch_lightning", LightningModule=torch.nn.Module
        ),
        "omegaconf": make_module(
            "omegaconf", ListConfig=list, DictConfig=dict,
            OmegaConf=None,
        ),
        "kornia": make_module("kornia"),
        "open_clip": make_module("open_clip"),
    }
    restore = override(stubs)
    sys.path.insert(0, SGM_ROOT)
    try:
        from sgm.modules.diffusionmodules.video_model import (
            VideoUNet as SgmVideoUNet)
    finally:
        sys.path.remove(SGM_ROOT)
        restore()

    torch.manual_seed(0)
    net = SgmVideoUNet(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_head_channels=16, transformer_depth=1, context_dim=24,
        extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        use_linear_in_transformer=True, num_classes="sequential",
        adm_in_channels=20, spatial_transformer_attn_type="softmax",
    ).eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if name.endswith("mix_factor"):
                # far from 0 so sigmoid(a) is far from 1/2 — pins the
                # BLEND DIRECTION, which symmetric values would hide
                p.copy_(torch.tensor([1.3]))
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return net


TINY = VideoUNetConfig(
    in_channels=8, out_channels=4, model_channels=32, channel_mult=(1, 2),
    num_res_blocks=1, attention_levels=(True, True), num_head_channels=16,
    context_dim=24, adm_in_channels=20, num_frames=T, norm_num_groups=32,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def ours(ref_net):
    model = VideoUNet(TINY)
    x0 = jnp.zeros((T, 16, 16, 8))
    params = model.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((T,)),
        jnp.zeros((T, 1, 24)), jnp.zeros((T, 20)),
    )
    sd = {
        f"model.diffusion_model.{k}": v.numpy()
        for k, v in ref_net.state_dict().items()
    }
    params = WS.convert_sv3d_unet(params, sd, channel_mult=(1, 2), num_res=1)
    return model, params


def test_converter_consumes_real_sgm_layout(ref_net, ours):
    """The converter was roundtrip-tested against a SYNTHESISED sgm dict;
    this pins it against the real module's own state_dict: every leaf
    count must match (no silently-skipped reference tensors)."""
    n_ref = len(ref_net.state_dict())
    n_ours = len(jax.tree_util.tree_leaves(ours[1]))
    assert n_ref == n_ours


@pytest.mark.parametrize("batch", [1, 2])
def test_video_unet_forward_golden(ref_net, ours, batch):
    model, params = ours
    rng = np.random.RandomState(7 + batch)
    bt = batch * T
    x = rng.randn(bt, 8, 16, 16).astype(np.float32)
    ts = np.linspace(0.3, 1.1, bt).astype(np.float32)
    ctx = rng.randn(bt, 1, 24).astype(np.float32)
    y = rng.randn(bt, 20).astype(np.float32)
    with torch.no_grad():
        want = ref_net(
            torch.from_numpy(x), torch.from_numpy(ts),
            context=torch.from_numpy(ctx), y=torch.from_numpy(y),
            num_video_frames=T,
            image_only_indicator=torch.zeros(batch, T),
        ).numpy()
    got = model.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts),
        jnp.asarray(ctx), jnp.asarray(y),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-6
    )
