"""InceptionV3-FID structural tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.models.inception import InceptionV3FID, preprocess_fid


@pytest.fixture(scope="module")
def inception():
    model = InceptionV3FID()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.key(0), x)
    return model, params


def test_feature_dim_is_2048(inception):
    model, params = inception
    out = model.apply(params, jnp.ones((2, 299, 299, 3)) * 0.5)
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_intermediate_grid_sizes(inception):
    """The torchvision InceptionV3 spatial pipeline must end at 8x8 before
    pooling — verified indirectly via a smaller input failing gracefully
    and the canonical input succeeding."""
    model, params = inception
    out = model.apply(params, jnp.zeros((1, 299, 299, 3)))
    assert out.shape == (1, 2048)


def test_preprocess(rng_np):
    """preprocess_fid yields the reference chain's 224² ImageNet-normalised
    tensor (fid_score.py:122-124); the model upsamples to 299 internally.
    Exact recipe parity lives in tests/test_metric_preprocessing.py."""
    img = rng_np.integers(0, 255, (64, 48, 3)).astype(np.uint8)
    x = preprocess_fid(img)
    assert x.shape == (1, 224, 224, 3)
    # ImageNet-normalised range, not [0, 1]
    assert float(x.min()) < 0.0 and float(x.max()) > 1.0


def test_batched_features_and_fid(tmp_path, rng_np, inception):
    from PIL import Image

    from freefine_tpu.metrics.fid import batched_features, make_inception_encoder
    from freefine_tpu.metrics.common import fid_from_features

    model, params = inception
    paths = []
    for i in range(5):
        img = rng_np.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    enc, prep = make_inception_encoder(params, batch_size=3)
    feats = batched_features(paths, enc, prep, batch_size=3)
    assert feats.shape == (5, 2048)
    # identical sets -> FID 0
    assert abs(fid_from_features(feats, feats.copy())) < 1e-4


def test_inception_converter_roundtrip(inception):
    """Synthesise a torchvision-layout state dict from the flax tree and
    convert back bit-exactly."""
    from freefine_tpu import weights as W

    model, params = inception
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    tensors = {}
    leaf_map = {
        "kernel": "conv.weight", "bn_scale": "bn.weight",
        "bn_bias": "bn.bias", "bn_mean": "bn.running_mean",
        "bn_var": "bn.running_var",
    }
    for path, leaf in flat:
        *mods, leaf_name = path
        segs = [p.key if hasattr(p, "key") else str(p) for p in mods]
        if segs and segs[-1] == "conv":
            segs = segs[:-1]
        leaf_str = leaf_name.key if hasattr(leaf_name, "key") else str(leaf_name)
        t = np.asarray(leaf, np.float32)
        if leaf_str == "kernel":
            t = t.transpose(3, 2, 0, 1)
        tensors[".".join(segs + [leaf_map[leaf_str]])] = t
    back = W.convert_inception_fid(params, tensors)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b))


# ---------------------------------------------------------------------------
# FIDInception branch-pool quirk pins vs torch
# (torchvision/pytorch_fid are not installed here, so the full-model golden
# is environment-blocked — see PARITY.md; these rebuild pytorch-fid's
# FIDInceptionA / FIDInceptionE_1 / FIDInceptionE_2 forward from torch.nn
# primitives, following FID/fid_score.py's vendored inception exactly, and
# pin our blocks against them with shared weights.)
# ---------------------------------------------------------------------------


def _torch_bnconv(torch, p):
    """torch replica of BasicConv2d (conv bias-free + BN eps=1e-3 + relu)
    from the flax BNConv params; padding reproduced from the kernel size
    (torchvision uses SAME-keeping explicit padding on 3x3/5x5/1x7/7x1)."""
    import numpy as np

    k = np.asarray(p["conv"]["kernel"], np.float32)  # HWIO
    kh, kw, cin, cout = k.shape
    conv = torch.nn.Conv2d(
        cin, cout, (kh, kw), padding=(kh // 2, kw // 2), bias=False
    )
    bn = torch.nn.BatchNorm2d(cout, eps=1e-3).eval()
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
        bn.weight.copy_(torch.from_numpy(np.asarray(p["bn_scale"], np.float32)))
        bn.bias.copy_(torch.from_numpy(np.asarray(p["bn_bias"], np.float32)))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(p["bn_mean"], np.float32)))
        bn.running_var.copy_(torch.from_numpy(np.asarray(p["bn_var"], np.float32)))

    def f(x):
        return torch.relu(bn(conv(x)))

    return f


def _rand_params(params, seed):
    import numpy as np

    rng = np.random.RandomState(seed)

    def r(leaf):
        a = rng.normal(scale=0.1, size=leaf.shape).astype(np.float32)
        return jnp.asarray(np.abs(a) + 0.5) if a.ndim == 1 else jnp.asarray(a)

    return jax.tree_util.tree_map(r, params)


def test_avg_pool_noinc_matches_torch():
    """count_include_pad=False average pool — the FID fix shared by
    FIDInceptionA/C/E_1 (pytorch-fid inception.py; reached from the
    reference's FID/fid_score.py)."""
    import torch
    import torch.nn.functional as F

    from freefine_tpu.models.inception import _avg_pool_noinc

    x = np.random.RandomState(0).randn(2, 9, 7, 5).astype(np.float32)
    want = F.avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=1, padding=1,
        count_include_pad=False,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(_avg_pool_noinc(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # ... and it must DIFFER from the count_include_pad=True pool
    # torchvision would use (guards against silently losing the fix)
    plain = F.avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=1, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    assert np.abs(plain - want).max() > 1e-3


@pytest.mark.parametrize("use_max_pool", [False, True])
def test_fid_inception_e_matches_torch(use_max_pool):
    """FIDInceptionE_1 (avg pool, count_include_pad=False) and
    FIDInceptionE_2 (MAX pool branch — pytorch-fid's tf-compat quirk) vs a
    torch rebuild with shared weights."""
    import torch
    import torch.nn.functional as F

    from freefine_tpu.models.inception import InceptionE

    model = InceptionE(use_max_pool)
    x = np.random.RandomState(1).randn(1, 9, 8, 16).astype(np.float32)
    params = _rand_params(
        model.init(jax.random.key(0), jnp.asarray(x)), seed=2
    )
    p = params["params"]

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        b1 = _torch_bnconv(torch, p["branch1x1"])(xt)
        b3 = _torch_bnconv(torch, p["branch3x3_1"])(xt)
        b3 = torch.cat([
            _torch_bnconv(torch, p["branch3x3_2a"])(b3),
            _torch_bnconv(torch, p["branch3x3_2b"])(b3),
        ], 1)
        bd = _torch_bnconv(torch, p["branch3x3dbl_1"])(xt)
        bd = _torch_bnconv(torch, p["branch3x3dbl_2"])(bd)
        bd = torch.cat([
            _torch_bnconv(torch, p["branch3x3dbl_3a"])(bd),
            _torch_bnconv(torch, p["branch3x3dbl_3b"])(bd),
        ], 1)
        if use_max_pool:  # FIDInceptionE_2
            bp = F.max_pool2d(xt, 3, stride=1, padding=1)
        else:             # FIDInceptionE_1
            bp = F.avg_pool2d(
                xt, 3, stride=1, padding=1, count_include_pad=False
            )
        bp = _torch_bnconv(torch, p["branch_pool"])(bp)
        want = torch.cat([b1, b3, bd, bp], 1).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fid_inception_a_matches_torch():
    """FIDInceptionA (1x1 / 5x5 / double-3x3 / noinc-avg-pool branches,
    concat order) vs a torch rebuild with shared weights."""
    import torch
    import torch.nn.functional as F

    from freefine_tpu.models.inception import InceptionA

    model = InceptionA(pool_features=32)
    x = np.random.RandomState(3).randn(1, 11, 9, 12).astype(np.float32)
    params = _rand_params(
        model.init(jax.random.key(0), jnp.asarray(x)), seed=4
    )
    p = params["params"]

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        b1 = _torch_bnconv(torch, p["branch1x1"])(xt)
        b5 = _torch_bnconv(torch, p["branch5x5_1"])(xt)
        b5 = _torch_bnconv(torch, p["branch5x5_2"])(b5)
        bd = _torch_bnconv(torch, p["branch3x3dbl_1"])(xt)
        bd = _torch_bnconv(torch, p["branch3x3dbl_2"])(bd)
        bd = _torch_bnconv(torch, p["branch3x3dbl_3"])(bd)
        bp = F.avg_pool2d(xt, 3, stride=1, padding=1, count_include_pad=False)
        bp = _torch_bnconv(torch, p["branch_pool"])(bp)
        want = torch.cat([b1, b5, bd, bp], 1).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)
