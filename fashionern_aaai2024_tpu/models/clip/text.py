"""CLIP text tower with the TME call surface.

The reference depends on a closed-source open_clip fork whose
`encode_text` accepts `visual_emb=` and `mode="seq"` and returns
`(global, seq)` tuples (`run/valid/validate_fiq.py:86-88`; the fork is
unavailable, `README.md:41`). Per the README's fallback guidance this
is the vanilla single-branch implementation of that surface:

  * global  — ln_final output at the EOT position @ text_projection
  * seq     — ln_final output at *every* position @ text_projection
              (per-token features in the joint dim, [B, 77, d])
  * visual_emb — ignored by DEFAULT (vanilla parity). With
                 `TextConfig.tme=True` the tower implements the TME
                 branch: post-transformer text token states cross-
                 attend the reference-patch embeddings (one pre-LN
                 cross-attention block, residual-added) before
                 ln_final — the visual conditioning the fork's call
                 sites pass patches for (`validate_fiq.py:86-88`).
                 Off-by-default so every checkpoint/parity path is
                 untouched; DEVIATIONS.md documents the design.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.clip.config import TextConfig
from fashionern_aaai2024_tpu.models.clip.transformer import LayerNorm, Transformer


class TextTower(nn.Module):
    config: TextConfig
    activation: str = "gelu"
    quantize_mlp: bool = False

    @nn.compact
    def __call__(self, text_ids: jnp.ndarray, visual_emb: jnp.ndarray | None = None):
        """text_ids: int32 [B, 77] → (global [B, d], seq [B, 77, d])."""
        cfg = self.config
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = token_embedding[text_ids] + positional_embedding[None]
        x = Transformer(
            cfg.width, cfg.layers, cfg.heads, self.activation, causal=True,
            quantize_mlp=self.quantize_mlp, name="transformer",
        )(x)
        if cfg.tme:
            if visual_emb is None:
                raise ValueError(
                    "TextConfig.tme=True requires visual_emb (the "
                    "reference-patch embeddings) at every encode_text "
                    "call; the vanilla path is tme=False (default)."
                )
            # TME branch: text tokens cross-attend the patch embeddings.
            # Pre-LN + residual, so a zero-initialized output projection
            # starts AT the vanilla function and learns the conditioning
            # — turning the flag on does not wreck pretrained text
            # features before fine-tuning.
            v = nn.Dense(cfg.width, name="tme_visual_proj")(
                visual_emb.astype(x.dtype))
            q = LayerNorm(cfg.width, name="tme_ln")(x)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=cfg.heads, qkv_features=cfg.width,
                out_kernel_init=nn.initializers.zeros,
                name="tme_cross_attn",
            )
            x = x + attn(inputs_q=q, inputs_k=v, inputs_v=v)
        x = LayerNorm(cfg.width, name="ln_final")(x)
        text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim),
        )
        seq = x @ text_projection                       # [B, 77, d]
        eot_pos = jnp.argmax(text_ids, axis=-1)         # EOT has the highest id
        global_feat = jnp.take_along_axis(
            seq, eot_pos[:, None, None], axis=1
        )[:, 0]                                          # [B, d]
        return global_feat, seq
