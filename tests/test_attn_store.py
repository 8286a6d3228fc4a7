"""AttentionStore debug instrument tests (reference attention.py:565-638)."""

import jax.numpy as jnp
import numpy as np
import pytest

from freefine_tpu.config import tiny_pipeline_config
from freefine_tpu.pipeline import FreeFine
from freefine_tpu.utils.attn_store import AttentionStore, classify_layer


@pytest.fixture(scope="module")
def tiny_pipe():
    return FreeFine(config=tiny_pipeline_config(), init_random=True)


def test_classify_layer():
    assert classify_layer(
        ("down_blocks_0_attentions_1", "transformer_blocks_0", "attn1",
         "attn_probs")
    ) == "down_self"
    assert classify_layer(
        ("up_blocks_2_attentions_0", "transformer_blocks_0", "attn2",
         "attn_probs")
    ) == "up_cross"
    assert classify_layer(
        ("mid_block_attentions_0", "transformer_blocks_0", "attn1",
         "attn_probs")
    ) == "mid_self"


def test_attention_maps_probe(tiny_pipe, rng_np):
    cfg = tiny_pipe.config
    lh, lw = cfg.latent_height, cfg.latent_width
    sample = jnp.asarray(rng_np.normal(size=(1, lh, lw, 4)), jnp.float32)
    ctx = tiny_pipe.encode_text(["a cat"])
    eps, maps = tiny_pipe.attention_maps(sample, jnp.int32(5), ctx)
    assert eps.shape == (1, lh, lw, 4)
    # every scope present; self maps square over <=32^2 queries; cross maps
    # attend to the 77 text tokens; all rows are probability distributions
    assert {"down_self", "down_cross", "mid_self", "mid_cross",
            "up_self", "up_cross"} <= set(maps)
    for key, layer_maps in maps.items():
        for m in layer_maps:
            assert m.shape[1] <= 32 * 32
            expect_k = m.shape[1] if key.endswith("self") else 77
            assert m.shape[2] == expect_k
            np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-4)

    # the flagship layer count: 16 transformer blocks -> 16 self + 16 cross
    assert sum(len(v) for k, v in maps.items() if k.endswith("self")) == 16


def test_attention_store_averaging(tiny_pipe, rng_np):
    cfg = tiny_pipe.config
    lh, lw = cfg.latent_height, cfg.latent_width
    ctx = tiny_pipe.encode_text(["a cat"])
    import dataclasses

    from freefine_tpu.edit import EditConfig

    ecfg = dataclasses.replace(EditConfig(), store_attention=True)
    store = AttentionStore()
    singles = []
    for s in range(2):
        sample = jnp.asarray(
            rng_np.normal(size=(1, lh, lw, 4)), jnp.float32
        )
        _, vs = tiny_pipe.unet.apply(
            tiny_pipe.params["unet"], sample, jnp.int32(3), ctx,
            edit_cfg=ecfg, mutable=["intermediates"],
        )
        store.update(vs["intermediates"])
        from freefine_tpu.utils.attn_store import collect_maps

        singles.append(collect_maps(vs["intermediates"]))
    assert store.cur_step == 2
    avg = store.get_average_attention()
    want = (singles[0]["up_self"][0] + singles[1]["up_self"][0]) / 2
    np.testing.assert_allclose(avg["up_self"][0], want, atol=1e-6)

    store.reset()
    assert store.cur_step == 0 and not store.attention_store
