"""TME — the trainable text-enhancement module.

Reconstruction of the reference's closed-source "TME" fork surface:
its `encode_text(text, visual_emb=ref_patch_feats)` conditions text
encoding on the reference image's patch features
(`/root/reference/run/valid/validate_fiq.py:86-88`; the module itself is
unavailable, `README.md:41`, so this is our design of that capability).

Placement is deliberately OUTSIDE the frozen CLIP tower: this framework
freezes CLIP structurally (the optimizer owns only the `ern` subtree and
every CLIP forward sits behind `stop_gradient`, train/state.py), so a
branch inside the text tower could never train — it would be a
permanent no-op (the r4 placement; corrected in r5). Here the module
operates on the tower's OUTPUT token features (joint embedding dim) and
lives in the ERN subtree, so it trains, checkpoints, exports, and serves
exactly like the rest of the fusion stack.

Zero-init: the cross-attention output projection starts at zero, so a
`tme=True` model computes exactly the vanilla function at init — turning
the flag on cannot wreck pretrained text features before fine-tuning.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TMEModule(nn.Module):
    """Text tokens cross-attend the reference patch features.

    text_seq: [B, 77, d] frozen-tower token features (joint dim)
    visual_emb: [B, P, d] reference patch features
    returns: enhanced [B, 77, d] = text_seq + CrossAttn(LN(text_seq), v)
    """

    dim: int
    heads: int = 8  # matches the fusion stack's MR cross-attention
    # (reference `models/fusion_model.py:44-47` uses 8 heads)

    @nn.compact
    def __call__(self, text_seq: jnp.ndarray,
                 visual_emb: jnp.ndarray) -> jnp.ndarray:
        v = nn.Dense(self.dim, name="visual_proj")(
            visual_emb.astype(text_seq.dtype))
        q = nn.LayerNorm(name="ln")(text_seq)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim,
            out_kernel_init=nn.initializers.zeros,
            name="cross_attn",
        )
        return text_seq + attn(inputs_q=q, inputs_k=v, inputs_v=v)
