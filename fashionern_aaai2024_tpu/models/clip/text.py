"""CLIP text tower with the TME call surface.

The reference depends on a closed-source open_clip fork whose
`encode_text` accepts `visual_emb=` and `mode="seq"` and returns
`(global, seq)` tuples (`run/valid/validate_fiq.py:86-88`; the fork is
unavailable, `README.md:41`). Per the README's fallback guidance this
is the vanilla single-branch implementation of that surface:

  * global  — ln_final output at the EOT position @ text_projection
  * seq     — ln_final output at *every* position @ text_projection
              (per-token features in the joint dim, [B, 77, d])
  * visual_emb — accepted and IGNORED here (vanilla parity): the tower
                 is structurally frozen in this framework (optimizer
                 owns only the `ern` subtree; every CLIP forward is
                 behind stop_gradient), so the TME conditioning lives
                 in the TRAINABLE ERN subtree instead —
                 models/ern/tme.py, applied by
                 ComposedCIRModel.encode_text when
                 `TextConfig.tme=True`. DEVIATIONS.md documents the
                 design (and why an in-tower branch could never train).
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
        del visual_emb  # vanilla tower: TME lives in the trainable ERN
        # subtree (models/ern/tme.py) — see module docstring
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
