"""Architecture + converter parity vs HuggingFace torch models.

No checkpoints are downloadable in this environment, but `transformers`
can construct randomly-initialised torch models from configs.  These tests
initialise a small HF model, convert its state dict with our tree-driven
converters, and compare forward outputs — validating BOTH the Flax
architecture and the weight mapping against the reference semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from freefine_tpu import weights as W  # noqa: E402


@pytest.mark.slow
def test_clip_text_gelu_parity_vs_transformers():
    """The SD-2.x text tower variant: hidden_act='gelu' (exact erf GELU).

    Pins CLIPTextConfig.activation='gelu' against torch at tiny scale —
    the sd21 manifests pin shapes, this pins the math."""
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel

    from freefine_tpu.config import CLIPTextConfig
    from freefine_tpu.models.text_encoder import CLIPTextEncoder

    hf_cfg = HFCfg(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, activation="gelu", dtype=jnp.float32,
    )
    model = CLIPTextEncoder(cfg)
    ids = np.random.default_rng(1).integers(0, 99, (2, 77)).astype(np.int32)
    params = model.init(jax.random.key(0), jnp.asarray(ids))
    params = {"params": W._convert_tree(
        params["params"], tensors, key_rewrites=W._TEXT_REWRITES
    )}

    with torch.no_grad():
        want = hf(torch.tensor(ids.astype(np.int64))).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_clip_text_parity_vs_transformers():
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel

    from freefine_tpu.config import CLIPTextConfig
    from freefine_tpu.models.text_encoder import CLIPTextEncoder

    hf_cfg = HFCfg(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, dtype=jnp.float32,
    )
    model = CLIPTextEncoder(cfg)
    ids = np.random.default_rng(1).integers(0, 99, (2, 77)).astype(np.int32)
    params = model.init(jax.random.key(0), jnp.asarray(ids))
    params = {"params": W._convert_tree(
        params["params"], tensors, key_rewrites=W._TEXT_REWRITES
    )}

    with torch.no_grad():
        want = hf(torch.tensor(ids.astype(np.int64))).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_clip_vision_parity_vs_transformers():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection

    from freefine_tpu.models.clip_image import CLIPImageEncoder, CLIPVisionConfig

    hf_cfg = HFCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=16, dtype=jnp.float32,
    )
    model = CLIPImageEncoder(cfg)
    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    params = W.convert_clip_vision(params, tensors)

    with torch.no_grad():
        want = hf(
            torch.tensor(x.transpose(0, 3, 1, 2))
        ).image_embeds.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_dinov2_parity_vs_transformers():
    from transformers import Dinov2Config as HFCfg
    from transformers import Dinov2Model

    from freefine_tpu.models.dinov2 import DINOv2, DINOv2Config

    hf_cfg = HFCfg(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=4, image_size=28, patch_size=14, layerscale_value=1.0,
    )
    torch.manual_seed(0)
    hf = Dinov2Model(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    # map HF dinov2 naming -> torchhub dinov2 naming our converter expects
    t = {}
    t["cls_token"] = sd["embeddings.cls_token"]
    t["pos_embed"] = sd["embeddings.position_embeddings"]
    t["patch_embed.proj.weight"] = sd[
        "embeddings.patch_embeddings.projection.weight"
    ]
    t["patch_embed.proj.bias"] = sd[
        "embeddings.patch_embeddings.projection.bias"
    ]
    for i in range(2):
        p = f"encoder.layer.{i}"
        q = sd[f"{p}.attention.attention.query.weight"]
        k = sd[f"{p}.attention.attention.key.weight"]
        v = sd[f"{p}.attention.attention.value.weight"]
        t[f"blocks.{i}.attn.qkv.weight"] = np.concatenate([q, k, v], 0)
        qb = sd[f"{p}.attention.attention.query.bias"]
        kb = sd[f"{p}.attention.attention.key.bias"]
        vb = sd[f"{p}.attention.attention.value.bias"]
        t[f"blocks.{i}.attn.qkv.bias"] = np.concatenate([qb, kb, vb], 0)
        t[f"blocks.{i}.attn.proj.weight"] = sd[f"{p}.attention.output.dense.weight"]
        t[f"blocks.{i}.attn.proj.bias"] = sd[f"{p}.attention.output.dense.bias"]
        t[f"blocks.{i}.norm1.weight"] = sd[f"{p}.norm1.weight"]
        t[f"blocks.{i}.norm1.bias"] = sd[f"{p}.norm1.bias"]
        t[f"blocks.{i}.norm2.weight"] = sd[f"{p}.norm2.weight"]
        t[f"blocks.{i}.norm2.bias"] = sd[f"{p}.norm2.bias"]
        t[f"blocks.{i}.ls1.gamma"] = sd[f"{p}.layer_scale1.lambda1"]
        t[f"blocks.{i}.ls2.gamma"] = sd[f"{p}.layer_scale2.lambda1"]
        t[f"blocks.{i}.mlp.fc1.weight"] = sd[f"{p}.mlp.fc1.weight"]
        t[f"blocks.{i}.mlp.fc1.bias"] = sd[f"{p}.mlp.fc1.bias"]
        t[f"blocks.{i}.mlp.fc2.weight"] = sd[f"{p}.mlp.fc2.weight"]
        t[f"blocks.{i}.mlp.fc2.bias"] = sd[f"{p}.mlp.fc2.bias"]
    t["norm.weight"] = sd["layernorm.weight"]
    t["norm.bias"] = sd["layernorm.bias"]

    cfg = DINOv2Config(dim=32, depth=2, heads=2, pos_embed_size=2)
    model = DINOv2(cfg)
    x = np.random.default_rng(3).normal(size=(1, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    params = W.convert_dinov2(params, t)

    with torch.no_grad():
        out = hf(torch.tensor(x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    patch, cls = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cls), out[:, 0], atol=3e-5)
    np.testing.assert_allclose(np.asarray(patch), out[:, 1:], atol=3e-5)


@pytest.mark.slow
def test_depth_anything_parity_vs_transformers():
    from transformers import (
        DepthAnythingConfig as HFDAConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config as HFDinoCfg,
    )

    from freefine_tpu.models.depth_anything import DepthAnything, DepthAnythingConfig
    from freefine_tpu.models.dinov2 import DINOv2Config

    hf_cfg = HFDAConfig(
        backbone_config=HFDinoCfg(
            hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
            image_size=28, patch_size=14, layerscale_value=1.0,
            out_indices=[1, 2, 3, 4], apply_layernorm=True,
            reshape_hidden_states=False,
        ),
        reassemble_hidden_size=32,
        fusion_hidden_size=16,
        neck_hidden_sizes=[8, 16, 16, 32],
        patch_size=14,
    )
    torch.manual_seed(0)
    hf = DepthAnythingForDepthEstimation(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = DepthAnythingConfig(
        backbone=DINOv2Config(dim=32, depth=4, heads=2, pos_embed_size=2),
        features=16,
        out_channels=(8, 16, 16, 32),
    )
    model = DepthAnything(cfg)
    x = np.random.default_rng(5).normal(size=(1, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    params = W.convert_depth_anything_hf(params, sd)

    with torch.no_grad():
        want = hf(torch.tensor(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_clip_tokenizer_parity_vs_transformers(tmp_path):
    """Our BPE must produce identical ids to transformers.CLIPTokenizer for
    the same vocab/merges files."""
    import json

    from transformers import CLIPTokenizer as HFTok

    from freefine_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode

    byte_vocab = list(bytes_to_unicode().values())
    merges = [
        ("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>"),
        ("d", "o"), ("do", "g</w>"), ("a", "n"), ("an", "d</w>"),
        ("r", "e"), ("re", "d</w>"),
    ]
    tokens = byte_vocab + [v + "</w>" for v in byte_vocab]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )

    hf = HFTok(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ours = CLIPTokenizer.from_pretrained(str(tmp_path), max_length=77)

    prompts = [
        "the cat and the dog",
        "a red cat, the dog!",
        "The Cat AND the red dog...",
        "cathedral dogma red123",
        "",
    ]
    for p in prompts:
        want = hf(p, padding="max_length", max_length=77,
                  truncation=True)["input_ids"]
        got = ours.encode(p).tolist()
        assert got == want, (p, got[:12], want[:12])
