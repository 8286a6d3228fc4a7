"""U2Net + HPS scoring tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.metrics.scoring import hps_single
from freefine_tpu.models.open_clip_text import OpenCLIPText, OpenCLIPTextConfig
from freefine_tpu.models.u2net import U2Net, get_mask_from_saliency, u2netp_config


def test_u2netp_forward():
    m = U2Net(u2netp_config())
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.key(0), x)
    out = m.apply(p, jnp.ones((1, 64, 64, 3)) * 0.3)
    assert out.shape == (1, 64, 64)
    o = np.asarray(out)
    assert (o > 0).all() and (o < 1).all()


def test_u2net_mask_extraction(rng_np):
    m = U2Net(u2netp_config())
    p = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    img = rng_np.integers(0, 255, (48, 40, 3)).astype(np.uint8)
    mask = get_mask_from_saliency(m, p, img, size=32)
    assert mask.shape == (48, 40)
    assert set(np.unique(mask)) <= {0, 255}


def test_open_clip_text_eot_pooling():
    cfg = OpenCLIPTextConfig(
        vocab_size=100, width=32, heads=2, layers=2, projection_dim=16
    )
    m = OpenCLIPText(cfg)
    ids = jnp.zeros((2, 77), jnp.int32)
    p = m.init(jax.random.key(0), ids)
    # eot = highest token id position; shifting it must change the output
    a = jnp.zeros((1, 77), jnp.int32).at[0, 5].set(99).at[0, 1].set(7)
    b = jnp.zeros((1, 77), jnp.int32).at[0, 20].set(99).at[0, 1].set(7)
    fa = m.apply(p, a)
    fb = m.apply(p, b)
    assert fa.shape == (1, 16)
    assert not np.allclose(np.asarray(fa), np.asarray(fb))


def test_hps_single_cosine():
    enc_i = lambda img: np.array([1.0, 0.0])
    enc_t = lambda s: np.array([1.0, 0.0]) if s == "same" else np.array([0.0, 1.0])
    img = np.zeros((4, 4, 3), np.uint8)
    assert hps_single(img, "same", enc_i, enc_t) == pytest.approx(1.0)
    assert hps_single(img, "other", enc_i, enc_t) == pytest.approx(0.0)


def test_image_reward_tiny_forward():
    from freefine_tpu.models.blip import BlipConfig, HashWordTokenizer, ImageReward

    cfg = BlipConfig(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=2, text_width=32, text_layers=2, text_heads=2,
        text_intermediate=64, vocab_size=500, max_text_len=8,
    )
    model = ImageReward(cfg)
    tok = HashWordTokenizer(vocab_size=500, max_len=8)
    ids, mask = tok.encode("a cat on a mat")
    img = jnp.zeros((1, 32, 32, 3))
    p = model.init(jax.random.key(0), img, jnp.asarray(ids)[None],
                   jnp.asarray(mask)[None])
    s = model.apply(p, img, jnp.asarray(ids)[None], jnp.asarray(mask)[None])
    assert s.shape == (1,)
    assert np.isfinite(float(s[0]))


def test_wordpiece_tokenizer():
    from freefine_tpu.models.blip import WordPieceTokenizer

    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "##s", "dog"]
    )}
    tok = WordPieceTokenizer(vocab, max_len=8)
    ids, mask = tok.encode("a cats dog zebra")
    assert ids[0] == vocab["[CLS]"]
    assert list(ids[1:5]) == [vocab["a"], vocab["cat"], vocab["##s"], vocab["dog"]]
    assert vocab["[SEP]"] in ids
    assert mask.sum() == 7


# ---------------------------------------------------------------------------
# U2Net weight path (official u2net.pth / u2netp.pth layout)
# ---------------------------------------------------------------------------


def _u2net_manifest_lines(cfg):
    from freefine_tpu.models.u2net import U2Net
    from freefine_tpu.weights import u2net_torch_key

    model = U2Net(cfg)
    var = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    )
    flat = jax.tree_util.tree_flatten_with_path(var["params"])[0]
    lines = []
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        ls = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        key = u2net_torch_key(segs, ls)
        shp = tuple(leaf.shape)
        if ls == "kernel":
            shp = (shp[3], shp[2], shp[0], shp[1])
        lines.append(f"{key} {','.join(map(str, shp))}")
    return sorted(lines)


@pytest.mark.parametrize("name", ["u2net", "u2netp"])
def test_u2net_key_manifest(name):
    """The flax tree must map exactly onto the committed official U-2-Net
    key manifest (both directions) — the same topology pin the SD manifests
    provide (tests/test_weight_manifest.py); catches any future module
    rename/shape drift that would silently break `load_u2net`."""
    import os

    from freefine_tpu.models.u2net import u2net_config, u2netp_config

    cfg = u2net_config() if name == "u2net" else u2netp_config()
    got = _u2net_manifest_lines(cfg)
    fix = os.path.join(
        os.path.dirname(__file__), "fixtures", f"{name}_keys.txt"
    )
    want = [ln for ln in open(fix).read().splitlines() if ln]
    assert got == want


def test_u2net_load_e2e(tmp_path):
    """load_u2net consumes a synthetic official-layout .pth (incl. the
    num_batches_tracked entries real checkpoints carry) and the loaded
    params drive get_mask_from_saliency end-to-end."""
    torch = pytest.importorskip("torch")
    import os

    from freefine_tpu.models.u2net import U2Net, u2netp_config
    from freefine_tpu.weights import load_u2net

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "u2netp_keys.txt")
    rng = np.random.RandomState(0)
    sd = {}
    for ln in open(fix).read().splitlines():
        key, shp = ln.split()
        shape = tuple(int(s) for s in shp.split(","))
        arr = rng.normal(scale=0.1, size=shape).astype(np.float32)
        if key.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        sd[key] = torch.from_numpy(arr)
        if key.endswith("running_var"):
            sd[key.replace("running_var", "num_batches_tracked")] = torch.tensor(0)
    path = tmp_path / "u2netp.pth"
    torch.save(sd, str(path))

    model = U2Net(u2netp_config())
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    params = load_u2net(params, str(path))

    # spot-check one converted leaf against the source tensor
    k = np.asarray(
        params["params"]["stage1"]["rebnconvin"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(
        k, sd["stage1.rebnconvin.conv_s1.weight"].numpy().transpose(2, 3, 1, 0)
    )
    img = (np.random.RandomState(1).rand(48, 40, 3) * 255).astype(np.uint8)
    mask = get_mask_from_saliency(model, params, img, size=64)
    assert mask.shape == (48, 40) and mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 255})


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
def test_u2net_convbnrelu_torch_parity(dilation):
    """ConvBNReLU (inference BN, dilated SAME-keeping padding) vs torch's
    REBNCONV = Conv2d(3x3, padding=dirate, dilation=dirate) + BatchNorm2d
    (eval) + ReLU — the building block of every RSU stage."""
    torch = pytest.importorskip("torch")

    from freefine_tpu.models.u2net import ConvBNReLU

    cin, cout, h, w = 5, 7, 13, 11
    rng = np.random.RandomState(dilation)
    x = rng.randn(1, h, w, cin).astype(np.float32)

    conv = torch.nn.Conv2d(cin, cout, 3, padding=dilation, dilation=dilation)
    bn = torch.nn.BatchNorm2d(cout).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(cout).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(cout).astype(np.float32) + 0.5))
        want = torch.relu(
            bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2))))
        ).numpy().transpose(0, 2, 3, 1)

    model = ConvBNReLU(cout, dilation=dilation)
    params = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(
                    conv.weight.detach().numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
            },
            "bn_scale": jnp.asarray(bn.weight.detach().numpy()),
            "bn_bias": jnp.asarray(bn.bias.detach().numpy()),
            "bn_mean": jnp.asarray(bn.running_mean.numpy()),
            "bn_var": jnp.asarray(bn.running_var.numpy()),
        }
    }
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)
