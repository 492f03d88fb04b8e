"""CLIP ViT image tower (ViT-B-16).

open_clip `VisionTransformer` semantics: 16×16 conv patch embed (no
bias), learned class token + positional embedding, ln_pre, 12 pre-LN
blocks, ln_post, linear projection to the joint dim.

`encode` returns (global [B, d], tokens [B, 197, d]): the reference's
ViT eval path expects per-token sequence features in the joint dim
alongside the global feature (`utils/utils.py:88-93`), so the projection
is applied to all tokens, with the global feature being the projected
class token — identical numerics at index 0.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.clip.config import VisionConfig
from fashionern_aaai2024_tpu.models.clip.transformer import LayerNorm, Transformer


class ViTTower(nn.Module):
    config: VisionConfig
    activation: str = "gelu"
    quantize_mlp: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: [B, H, W, 3] (NHWC, CLIP-normalized)."""
        cfg = self.config
        grid = cfg.image_size // cfg.patch_size

        x = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            name="conv1",
        )(images)                                   # [B, g, g, W]
        b = x.shape[0]
        x = x.reshape(b, grid * grid, cfg.width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(cfg.width ** -0.5), (cfg.width,)
        )
        cls = jnp.broadcast_to(class_embedding[None, None, :], (b, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)       # [B, 197, W]
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(cfg.width ** -0.5),
            (grid * grid + 1, cfg.width),
        )
        x = x + positional_embedding[None]
        x = LayerNorm(cfg.width, name="ln_pre")(x)
        x = Transformer(
            cfg.width, cfg.layers, cfg.heads, self.activation,
            quantize_mlp=self.quantize_mlp, name="transformer"
        )(x)
        x = LayerNorm(cfg.width, name="ln_post")(x)
        proj = self.param(
            "proj", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim),
        )
        tokens = x @ proj                            # [B, 197, d]
        return tokens[:, 0], tokens
