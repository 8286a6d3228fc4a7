"""SDXL-backbone FreeFine pipeline (dual text encoders + micro-conditioning).

The reference names the SDXL/DiT backbone swap as its scaling TODO
(/root/reference/README.md:77); a working SDXL editing stack exists in its
eval tree (/root/reference/evaluation/DesignEdit/utils/sdxl.py), whose
conditioning protocol this follows:

  * context = concat(CLIP-L hidden_states[-2] [768], OpenCLIP-bigG
    hidden_states[-2] [1280]) -> [B, 77, 2048];
  * added_cond = concat(bigG pooled projection [1280],
    Fourier(time_ids) [6*256]) -> [B, 2816], folded into the timestep
    embedding by the UNet's add_embedding MLP (models/unet.py added_cond).

All three editing entry points (generation / background_generation /
cross_image_composition) are inherited from `FreeFine` — only the text
conditioning hooks differ; the loops thread (context, added_cond) tuples
through jit opaquely.

Documented deviation: diffusers uses a second tokenizer whose padding token
is 0 (OpenCLIP convention) while CLIP pads with EOT; we retokenize once and
rewrite the padding for the second tower (`_openclip_ids`), so one BPE vocab
serves both towers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from freefine_tpu.config import PipelineConfig, sdxl_pipeline_config
from freefine_tpu.models.layers import timestep_embedding
from freefine_tpu.models.open_clip_text import OpenCLIPTextHidden
from freefine_tpu.pipeline import FreeFine

# diffusers UNet2DConditionConfig.addition_time_embed_dim for SDXL
TIME_ID_DIM = 256


class SDXLFreeFine(FreeFine):
    """FreeFine editing on the SDXL backbone."""

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        params: Optional[dict] = None,
        tokenizer_path: Optional[str] = None,
        init_random: bool = False,
        seed: int = 0,
    ):
        config = config or sdxl_pipeline_config()
        assert config.text2 is not None, "SDXL needs a second text tower"
        self.text_encoder_2 = OpenCLIPTextHidden(config=config.text2)
        super().__init__(
            config=config, params=params, tokenizer_path=tokenizer_path,
            init_random=init_random, seed=seed,
        )

    # -- setup --------------------------------------------------------------

    def init_params(self, rng) -> dict:
        cfg = self.config
        lh, lw = cfg.latent_height, cfg.latent_width
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        sample = jnp.zeros((1, lh, lw, cfg.unet.in_channels), cfg.unet.dtype)
        ctx = jnp.zeros((1, 77, cfg.unet.cross_attention_dim), cfg.unet.dtype)
        added = jnp.zeros((1, cfg.unet.addition_embed_dim), cfg.unet.dtype)
        img = jnp.zeros((1, cfg.height, cfg.width, 3), cfg.vae.dtype)
        ids = jnp.zeros((1, cfg.text.max_length), jnp.int32)
        pos = jnp.zeros((1,), jnp.int32)
        return {
            "unet": self.unet.init(
                r1, sample, jnp.int32(1), ctx, added_cond=added
            ),
            "vae": self.vae.init(r2, img),
            "text": self.text_encoder.init(r3, ids, penultimate=True),
            "text2": self.text_encoder_2.init(r4, ids, pos),
        }

    # -- dual-tower text conditioning ----------------------------------------

    def _openclip_ids(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """CLIP-padded ids -> (OpenCLIP-padded ids, eot positions)."""
        eos = self.tokenizer.eos
        eot = np.argmax(ids == eos, axis=1).astype(np.int32)
        ids2 = ids.copy()
        for row, e in zip(ids2, eot):
            row[e + 1:] = 0
        return ids2, eot

    def _encode_dual(self, texts: Sequence[str]):
        """-> (context [B, 77, 2048], pooled [B, 1280])."""
        ids = np.asarray(self.tokenizer.batch_encode(list(texts)))
        ids2, eot = self._openclip_ids(ids)

        def fn(p, i1, i2, ep):
            h1 = self.text_encoder.apply(p["text"], i1, penultimate=True)
            h2, pooled = self.text_encoder_2.apply(p["text2"], i2, ep)
            ctx = jnp.concatenate(
                [h1.astype(jnp.float32), h2.astype(jnp.float32)], axis=-1
            )
            return ctx, pooled.astype(jnp.float32)

        jit_fn = self._jit("text_dual", fn)
        return jit_fn(
            self.params, jnp.asarray(ids), jnp.asarray(ids2), jnp.asarray(eot)
        )

    def encode_text(self, texts: Sequence[str]) -> jnp.ndarray:
        """[B, 77, 2048] concatenated penultimate hidden states."""
        return self._encode_dual(texts)[0]

    def _added_cond(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """pooled [B, P] -> [B, P + 6*256] micro-conditioning vector.

        time_ids = (orig_h, orig_w, crop_top, crop_left, target_h, target_w),
        each through the 256-d sinusoid (diffusers _get_add_time_ids)."""
        cfg = self.config
        tids = jnp.asarray(
            [cfg.height, cfg.width, 0, 0, cfg.height, cfg.width], jnp.float32
        )
        emb = timestep_embedding(tids, TIME_ID_DIM).reshape(1, -1)
        return jnp.concatenate(
            [pooled, jnp.tile(emb, (pooled.shape[0], 1))], axis=-1
        )

    # -- conditioning hooks consumed by the inherited entry points -----------

    def _inversion_text_embeddings(self, batch: int):
        ctx, pooled = self._encode_dual([""])
        added = self._added_cond(pooled)
        return (
            jnp.tile(ctx, (batch, 1, 1)),
            jnp.tile(added, (batch, 1)),
        )

    def _edit_text_embeddings(self, guidance_text: str):
        ctx, pooled = self._encode_dual(["", guidance_text])
        added = self._added_cond(pooled)
        # deduped 3-stream layout [u_e, r, c_e] (see pipeline.sample_edit_loop)
        order = jnp.asarray([0, 0, 1])
        return ctx[order], added[order]

    def _stream_text_embeddings(self, texts: Sequence[str]):
        ctx, pooled = self._encode_dual(texts)
        return ctx, self._added_cond(pooled)

    def _extra_text_embeddings(self, texts: Sequence[str]):
        # region-prompt K/V only (no added conditioning on the extra context)
        return self._encode_dual(texts)[0]

    def _batch_text_embeddings(self, texts: Sequence[str]):
        """Batched-lane conditioning: (context, added_cond) per case —
        BatchedFreeFine stacks tree-leaf-wise, so SDXL cases batch like SD
        ones (the dual-tower added conditioning rides as a second leaf)."""
        ctx, pooled = self._encode_dual(list(texts))
        return ctx, self._added_cond(pooled)
