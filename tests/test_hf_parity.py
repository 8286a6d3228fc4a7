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

    # non-native size: drives interpolate_pos_encoding (torch-convention
    # bicubic, A=-0.75 — identity at the native grid, so the case above
    # cannot see a kernel mismatch)
    x2 = np.random.default_rng(5).normal(size=(1, 56, 42, 3)).astype(np.float32)
    with torch.no_grad():
        out2 = hf(torch.tensor(x2.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    patch2, cls2 = model.apply(params, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(cls2), out2[:, 0], atol=3e-5)
    np.testing.assert_allclose(np.asarray(patch2), out2[:, 1:], atol=3e-5)


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


@pytest.mark.slow
def test_image_reward_blip_parity_vs_transformers():
    """Full ImageReward scoring path (BLIP ViT -> cross BERT -> MLP head)
    vs transformers' BlipVisionModel + BlipTextModel.

    transformers' BLIP modules are a direct port of the BLIP med.py /
    timm-ViT stack ImageReward builds on (reference
    evaluation/metrics/image_reward.py loads ImageReward-v1.0), so forward
    agreement here pins both our architecture (incl. the absence of
    token-type embeddings and the cross-attention-on-every-layer layout)
    and `weights.convert_blip_image_reward`'s key mapping.  The MLP head +
    released normalisation constants are recomputed in numpy."""
    from transformers import BlipTextConfig, BlipVisionConfig
    from transformers.models.blip.modeling_blip import BlipVisionModel
    from transformers.models.blip.modeling_blip_text import BlipTextModel

    from freefine_tpu.models.blip import IR_MEAN, IR_STD, BlipConfig, ImageReward

    vcfg = BlipVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        layer_norm_eps=1e-6,  # timm/BLIP ViT eps (our LayerNorm32(1e-6))
    )
    tcfg = BlipTextConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, vocab_size=99, encoder_hidden_size=32,
        is_decoder=True,  # config flag only creates the cross-attn modules;
        layer_norm_eps=1e-12,  # the forward below runs bidirectional
    )
    torch.manual_seed(0)
    hf_v = BlipVisionModel(vcfg).eval()
    hf_t = BlipTextModel(tcfg, add_pooling_layer=False).eval()

    # Rebuild the ImageReward-v1.0 checkpoint naming the converter expects:
    # vision in timm style under blip.visual_encoder., text (already med.py
    # naming) under blip.text_encoder., MLP head as mlp.layers.{0,2,4,6,8}.
    tensors = {}
    for k, t in hf_v.state_dict().items():
        a = t.numpy()
        k = (k.replace("embeddings.patch_embedding", "patch_embed.proj")
              .replace("encoder.layers.", "blocks.")
              .replace(".self_attn.qkv", ".attn.qkv")
              .replace(".self_attn.projection", ".attn.proj")
              .replace(".layer_norm1", ".norm1")
              .replace(".layer_norm2", ".norm2")
              .replace("post_layernorm", "norm"))
        if k == "embeddings.class_embedding":
            k, a = "cls_token", a.reshape(1, 1, -1)
        elif k == "embeddings.position_embedding":
            k = "pos_embed"
        tensors[f"blip.visual_encoder.{k}"] = a
    for k, t in hf_t.state_dict().items():
        tensors[f"blip.text_encoder.{k}"] = t.numpy()
    rng = np.random.default_rng(7)
    dims = [(1024, 24), (128, 1024), (64, 128), (16, 64), (1, 16)]
    for i, (o, n) in zip((0, 2, 4, 6, 8), dims):
        tensors[f"mlp.layers.{i}.weight"] = rng.normal(
            scale=0.05, size=(o, n)).astype(np.float32)
        tensors[f"mlp.layers.{i}.bias"] = rng.normal(
            scale=0.05, size=(o,)).astype(np.float32)

    cfg = BlipConfig(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=2, text_width=24, text_layers=2, text_heads=2,
        text_intermediate=48, vocab_size=99, max_text_len=8,
        dtype=jnp.float32,
    )
    model = ImageReward(cfg)
    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ids = np.random.default_rng(3).integers(0, 99, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    mask[1, 5:] = 0
    params = model.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(ids), jnp.asarray(mask)
    )
    params = W.convert_blip_image_reward(params, tensors)

    with torch.no_grad():
        img = hf_v(torch.tensor(x.transpose(0, 3, 1, 2))).last_hidden_state
        txt = hf_t(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            encoder_hidden_states=img,
            encoder_attention_mask=torch.ones(img.shape[:2], dtype=torch.long),
            is_decoder=False,
        ).last_hidden_state.numpy()
    h = txt[:, 0]
    for i in (0, 2, 4, 6, 8):
        h = h @ tensors[f"mlp.layers.{i}.weight"].T + tensors[f"mlp.layers.{i}.bias"]
        if i < 8:
            h = np.maximum(h, 0.0)
    want = (h[:, 0] - IR_MEAN) / IR_STD

    got = np.asarray(model.apply(
        params, jnp.asarray(x), jnp.asarray(ids), jnp.asarray(mask)
    ))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.slow
def test_open_clip_text_parity_vs_transformers():
    """OpenCLIP text tower (HPSv2.1's ViT-H backbone, plain-GELU variant) vs
    transformers CLIPTextModelWithProjection with hidden_act='gelu'.

    The two codebases implement the same architecture under different state
    dict layouts (fused in_proj vs split q/k/v, raw positional_embedding /
    text_projection params vs Linear modules); this pins both our forward
    math (causal mask, EOT argmax pooling, bias-free projection) and the
    open_clip-naming remap in `weights.convert_open_clip_text`."""
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection

    from freefine_tpu.models.open_clip_text import (
        OpenCLIPText, OpenCLIPTextConfig,
    )

    eos = 98
    hf_cfg = HFCfg(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu", projection_dim=16,
        eos_token_id=eos,
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    # transformers CLIP naming -> open_clip naming (what HPS ckpts use).
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    tensors = {
        "token_embedding.weight": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        "text_projection": sd["text_projection.weight"].T,
    }
    for i in range(hf_cfg.num_hidden_layers):
        src = f"text_model.encoder.layers.{i}"
        dst = f"transformer.resblocks.{i}"
        tensors[f"{dst}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{src}.self_attn.{n}_proj.weight"] for n in ("q", "k", "v")], 0
        )
        tensors[f"{dst}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{src}.self_attn.{n}_proj.bias"] for n in ("q", "k", "v")], 0
        )
        tensors[f"{dst}.attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
        tensors[f"{dst}.attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
        tensors[f"{dst}.ln_1.weight"] = sd[f"{src}.layer_norm1.weight"]
        tensors[f"{dst}.ln_1.bias"] = sd[f"{src}.layer_norm1.bias"]
        tensors[f"{dst}.ln_2.weight"] = sd[f"{src}.layer_norm2.weight"]
        tensors[f"{dst}.ln_2.bias"] = sd[f"{src}.layer_norm2.bias"]
        tensors[f"{dst}.mlp.c_fc.weight"] = sd[f"{src}.mlp.fc1.weight"]
        tensors[f"{dst}.mlp.c_fc.bias"] = sd[f"{src}.mlp.fc1.bias"]
        tensors[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.fc2.weight"]
        tensors[f"{dst}.mlp.c_proj.bias"] = sd[f"{src}.mlp.fc2.bias"]

    cfg = OpenCLIPTextConfig(
        vocab_size=99, width=32, heads=2, layers=2, context_length=77,
        projection_dim=16, dtype=jnp.float32,
    )
    model = OpenCLIPText(cfg)
    # one EOS (= the max id) per row so HF's first-eos pooling and
    # open_clip's argmax pooling select the same position
    rng = np.random.default_rng(1)
    ids = rng.integers(1, eos, (3, 77)).astype(np.int32)
    for row, pos in enumerate((5, 20, 76)):
        ids[row, pos] = eos
    params = model.init(jax.random.key(0), jnp.asarray(ids))
    params = W.convert_open_clip_text(params, tensors, prefix="")

    with torch.no_grad():
        want = hf(torch.tensor(ids.astype(np.int64))).text_embeds.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.slow
def test_t5_encoder_parity_vs_transformers():
    """The PixArt caption tower: T5 v1.1 encoder (gated-gelu, relative
    position bias, no attention scaling) vs transformers T5EncoderModel at
    tiny scale through convert_t5_encoder."""
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from freefine_tpu.models.t5 import T5Encoder, tiny_t5_config

    cfg = tiny_t5_config()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        num_heads=cfg.num_heads, d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dense_act_fn="gelu_new",
        is_gated_act=True, tie_word_embeddings=False, dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in hf.state_dict().items()}

    model = T5Encoder(config=cfg)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[0, 9:] = 0
    mask[1, 5:] = 0

    params = model.init(jax.random.key(0), jnp.asarray(ids))
    params = W.convert_t5_encoder(params, tensors)

    got = np.asarray(
        model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    # padded positions still produce hidden states in both; compare all
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_open_clip_vision_parity_vs_transformers():
    """OpenCLIP vision tower (HPSv2.1's ViT-H image side, plain-GELU) vs
    transformers CLIPVisionModelWithProjection with hidden_act='gelu'.

    Pins both the activation switch (open_clip ViT-H-14 has no quick_gelu
    flag -> exact GELU, unlike the OpenAI-checkpoint towers) and
    `weights.convert_open_clip_vision`'s remap of open_clip's `visual.*`
    layout (fused in_proj, bias-free conv1 stem, raw `proj` matrix)."""
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection

    from freefine_tpu.models.clip_image import CLIPImageEncoder, CLIPVisionConfig

    hf_cfg = HFCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        projection_dim=16, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    # transformers CLIP naming -> open_clip `visual.` naming (HPS ckpts).
    pre = "vision_model."
    tensors = {
        "visual.class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "visual.positional_embedding": sd[
            f"{pre}embeddings.position_embedding.weight"
        ],
        "visual.conv1.weight": sd[f"{pre}embeddings.patch_embedding.weight"],
        "visual.ln_pre.weight": sd[f"{pre}pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd[f"{pre}pre_layrnorm.bias"],
        "visual.ln_post.weight": sd[f"{pre}post_layernorm.weight"],
        "visual.ln_post.bias": sd[f"{pre}post_layernorm.bias"],
        "visual.proj": sd["visual_projection.weight"].T,
    }
    for i in range(hf_cfg.num_hidden_layers):
        src = f"{pre}encoder.layers.{i}"
        dst = f"visual.transformer.resblocks.{i}"
        tensors[f"{dst}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{src}.self_attn.{n}_proj.weight"] for n in ("q", "k", "v")], 0
        )
        tensors[f"{dst}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{src}.self_attn.{n}_proj.bias"] for n in ("q", "k", "v")], 0
        )
        tensors[f"{dst}.attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
        tensors[f"{dst}.attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
        tensors[f"{dst}.ln_1.weight"] = sd[f"{src}.layer_norm1.weight"]
        tensors[f"{dst}.ln_1.bias"] = sd[f"{src}.layer_norm1.bias"]
        tensors[f"{dst}.ln_2.weight"] = sd[f"{src}.layer_norm2.weight"]
        tensors[f"{dst}.ln_2.bias"] = sd[f"{src}.layer_norm2.bias"]
        tensors[f"{dst}.mlp.c_fc.weight"] = sd[f"{src}.mlp.fc1.weight"]
        tensors[f"{dst}.mlp.c_fc.bias"] = sd[f"{src}.mlp.fc1.bias"]
        tensors[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.fc2.weight"]
        tensors[f"{dst}.mlp.c_proj.bias"] = sd[f"{src}.mlp.fc2.bias"]

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=16, activation="gelu",
        dtype=jnp.float32,
    )
    model = CLIPImageEncoder(cfg)
    x = np.random.default_rng(4).normal(size=(2, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    params = W.convert_open_clip_vision(params, tensors)

    with torch.no_grad():
        want = hf(torch.tensor(x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-5)

    # QuickGELU vs GELU must actually differ (guards the activation plumb)
    cfg_q = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=16, dtype=jnp.float32,
    )
    got_q = np.asarray(CLIPImageEncoder(cfg_q).apply(params, jnp.asarray(x)))
    assert np.abs(got_q - want).max() > 1e-4


@pytest.mark.slow
def test_dino_v1_parity_vs_transformers():
    """SUBC's DINO-v1 ViT-B/16 (VBench/subject_consistency.py:10-16 loads
    torchhub `dino_vitb16`) hosted by our DINOv2 module, through
    `weights.convert_dino_v1`, vs transformers ViTModel — the same
    plain-ViT architecture (no LayerScale; the converter synthesises
    identity gammas) with eps 1e-6 and exact GELU."""
    from transformers import ViTConfig as HFCfg
    from transformers import ViTModel

    from freefine_tpu.models.dinov2 import DINOv2, DINOv2Config

    hf_cfg = HFCfg(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16,
        layer_norm_eps=1e-6, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    # transformers ViT naming -> the DINO-v1 torchhub layout (the published
    # dino_vitb16_pretrain.pth key set: no ls1/ls2 gammas anywhere).
    t = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": sd[
            "embeddings.patch_embeddings.projection.weight"
        ],
        "patch_embed.proj.bias": sd[
            "embeddings.patch_embeddings.projection.bias"
        ],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(2):
        p = f"encoder.layer.{i}"
        t[f"blocks.{i}.attn.qkv.weight"] = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.weight"]
             for n in ("query", "key", "value")], 0
        )
        t[f"blocks.{i}.attn.qkv.bias"] = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.bias"]
             for n in ("query", "key", "value")], 0
        )
        t[f"blocks.{i}.attn.proj.weight"] = sd[f"{p}.attention.output.dense.weight"]
        t[f"blocks.{i}.attn.proj.bias"] = sd[f"{p}.attention.output.dense.bias"]
        t[f"blocks.{i}.norm1.weight"] = sd[f"{p}.layernorm_before.weight"]
        t[f"blocks.{i}.norm1.bias"] = sd[f"{p}.layernorm_before.bias"]
        t[f"blocks.{i}.norm2.weight"] = sd[f"{p}.layernorm_after.weight"]
        t[f"blocks.{i}.norm2.bias"] = sd[f"{p}.layernorm_after.bias"]
        t[f"blocks.{i}.mlp.fc1.weight"] = sd[f"{p}.intermediate.dense.weight"]
        t[f"blocks.{i}.mlp.fc1.bias"] = sd[f"{p}.intermediate.dense.bias"]
        t[f"blocks.{i}.mlp.fc2.weight"] = sd[f"{p}.output.dense.weight"]
        t[f"blocks.{i}.mlp.fc2.bias"] = sd[f"{p}.output.dense.bias"]

    cfg = DINOv2Config(dim=32, depth=2, heads=2, patch_size=16, pos_embed_size=2)
    model = DINOv2(cfg)
    x = np.random.default_rng(6).normal(size=(1, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    params = W.convert_dino_v1(params, t)

    with torch.no_grad():
        out = hf(torch.tensor(x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    patch, cls = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cls), out[:, 0], atol=3e-5)
    np.testing.assert_allclose(np.asarray(patch), out[:, 1:], atol=3e-5)
