"""ERN: the top-level trainable model with the reference's mode API.

The reference dispatches on a `mode` string inside one forward
(`models/model.py:22-75`). A traced-string dispatch is hostile to jit,
so here each mode is its own method — jit-compiled separately — while
`__call__(..., mode=...)` keeps the reference's 6-mode surface for
API compatibility. The CLIP-backed modes ("image"/"text_global"/
"text_seq") live on the composed CIR model (models/composed.py), since
CLIP is a frozen, separately-owned tower in this design.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.ern.fusion import CombinerSimple, DVRModule, VisualSR
from fashionern_aaai2024_tpu.models.ern.tme import TMEModule


class ERN(nn.Module):
    """Query tower: DVR fusion. Target/gallery tower: SR + Combiner.

    Matches reference `ERN` (`models/model.py:7-75`) minus the CLIP
    wrappers (frozen encoders live outside the trainable module).

    `tme=True` adds the trainable TME text-enhancement module
    (models/ern/tme.py) — it must live in this subtree to train at all
    (the CLIP towers are structurally frozen).
    """

    feature_dim: int
    patch_num: int = 13
    tme: bool = False

    def setup(self):
        self.DVR = DVRModule(self.feature_dim)
        self.SR_module = VisualSR(self.feature_dim, num_region=self.patch_num)
        self.Combiner_module = CombinerSimple(self.feature_dim)
        if self.tme:
            self.TME = TMEModule(self.feature_dim)

    def enhance_text(self, text_seq, visual_emb):
        """TME conditioning over frozen text token features (the
        composed model calls this from `encode_text`)."""
        return self.TME(text_seq, visual_emb)

    def index(self, tar_feats, tar_local_feats, *, deterministic: bool = True):
        """Gallery-side embedding: Combiner(tar_global, SR(tar_patches))."""
        center = self.SR_module(tar_local_feats, deterministic=deterministic)
        return self.Combiner_module(tar_feats, center, deterministic=deterministic)

    def query(
        self, ref_feats, ref_local_feats, text_feats, text_seq_feats,
        *, deterministic: bool = True,
    ):
        """Query-side embedding (reference mode="test")."""
        return self.DVR(
            ref_local_feats, text_seq_feats, ref_feats, text_feats,
            deterministic=deterministic,
        )

    def train_step_features(
        self,
        ref_feats, ref_local_feats, text_feats, text_seq_feats,
        tar_feats, tar_local_feats,
        *, deterministic: bool = False,
    ):
        """(query embedding, target embedding) — reference mode="train"."""
        fusion = self.query(
            ref_feats, ref_local_feats, text_feats, text_seq_feats,
            deterministic=deterministic,
        )
        target = self.index(tar_feats, tar_local_feats, deterministic=deterministic)
        return fusion, target

    def __call__(
        self,
        ref_feats=None,
        ref_local_feats=None,
        text_feats=None,
        text_seq_feats=None,
        tar_feats=None,
        tar_local_feats=None,
        mode: str = "train",
        deterministic: bool = True,
    ):
        if mode == "index":
            return self.index(tar_feats, tar_local_feats, deterministic=deterministic)
        if mode == "test":
            return self.query(
                ref_feats, ref_local_feats, text_feats, text_seq_feats,
                deterministic=deterministic,
            )
        if mode == "train":
            return self.train_step_features(
                ref_feats, ref_local_feats, text_feats, text_seq_feats,
                tar_feats, tar_local_feats, deterministic=deterministic,
            )
        raise ValueError(
            f"mode {mode!r} not handled by ERN; CLIP modes (image/text_global/"
            "text_seq) live on models.composed.ComposedCIRModel"
        )
