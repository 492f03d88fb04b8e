"""The combined CLIP model: frozen dual encoder with the TME surface.

Role of `open_clip.create_model_and_transforms` + the reference's
`ImageCLIP`/`TextCLIP` wrappers (`models/clip_model.py:5-31`). Frozen-ness
is functional here: callers wrap calls in `jax.lax.stop_gradient` (see
models.composed) instead of `.eval()` + `torch.no_grad()`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.clip.config import CLIPConfig
from fashionern_aaai2024_tpu.models.clip.resnet import ModifiedResNet
from fashionern_aaai2024_tpu.models.clip.text import TextTower
from fashionern_aaai2024_tpu.models.clip.vit import ViTTower


class CLIP(nn.Module):
    config: CLIPConfig

    def setup(self):
        if self.config.vision.kind == "vit":
            self.visual = ViTTower(self.config.vision, self.config.activation,
                                   self.config.quantize_mlp)
        else:
            self.visual = ModifiedResNet(self.config.vision)
        self.text = TextTower(self.config.text, self.config.activation,
                              self.config.quantize_mlp)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
        )

    def encode_image(self, images: jnp.ndarray):
        """[B, H, W, 3] → (global [B, d], tokens [B, S, d]).

        The tuple mirrors the reference ViT path's expectation of
        `(features, token_seq)` (`utils/utils.py:88-93`).

        Accepts uint8 images and CLIP-normalizes them on device (the
        u8 feed moves 4× fewer bytes host→device than pre-normalized
        float32; the normalize fuses into the first conv's epilogue
        under XLA). float32 inputs are assumed already normalized —
        the host pipeline's default."""
        if images.dtype == jnp.uint8:
            from fashionern_aaai2024_tpu.data.transforms import CLIP_MEAN, CLIP_STD

            scale = (1.0 / (255.0 * CLIP_STD)).astype(np.float32)
            shift = (-CLIP_MEAN / CLIP_STD).astype(np.float32)
            images = images.astype(jnp.float32) * scale + shift
            # Follow the precision policy: under bf16-cast variables
            # (train/state.py cast_frozen_clip_bf16, eval --precision
            # bf16) f32 inputs would promote every tower matmul back to
            # f32 — logit_scale's runtime dtype tracks the cast tree.
            images = images.astype(self.logit_scale.dtype)
        return self.visual(images)

    def encode_text(
        self,
        text_ids: jnp.ndarray,
        mode: str = "global",
        visual_emb: jnp.ndarray | None = None,
    ):
        """TME-fork-compatible surface (`run/valid/validate_fiq.py:86-88`).

        mode="global" → (global [B, d], seq [B, 77, d]) tuple;
        mode="seq"    → seq [B, 77, d] only.
        `visual_emb` is accepted and ignored (vanilla single branch per
        `README.md:41`); it is the extension point where the closed
        TME module would condition text encoding on reference patches.
        """
        global_feat, seq = self.text(text_ids, visual_emb=visual_emb)
        if mode == "seq":
            return seq
        return global_feat, seq

    def __call__(self, images, text_ids):
        image_feat, _ = self.encode_image(images)
        text_feat, _ = self.encode_text(text_ids)
        return image_feat, text_feat, self.logit_scale
