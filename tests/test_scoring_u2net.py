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
