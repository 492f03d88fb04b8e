"""ComposedCIRModel: frozen CLIP + trainable ERN, the full 6-mode API.

This is the user-facing model matching the reference ERN's complete
contract (`models/model.py:22-75`):

  mode="image"       → CLIP image global embedding          [B, d]
  mode="text_global" → CLIP text global embedding           [B, d]
  mode="text_seq"    → CLIP per-token text embeddings       [B, 77, d]
  mode="index"       → gallery tower: Combiner(tar, SR(tar_patches))
  mode="test"        → query tower: DVR fusion
  mode="train"       → (query, target) pair

CLIP freezing (reference: `clip_model.eval()` + `torch.no_grad()`,
`models/clip_model.py:11-31`; optimizer filters out CLIP params,
`run/train/train_fiq.py:92-100`) is functional here: CLIP forwards are
wrapped in `stop_gradient`, and the train step optimizes only the
`ern` subtree (see train.trainer.trainable_filter).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fashionern_aaai2024_tpu.models.clip.config import CLIPConfig
from fashionern_aaai2024_tpu.models.clip.model import CLIP
from fashionern_aaai2024_tpu.models.ern.ern import ERN


class ComposedCIRModel(nn.Module):
    clip_config: CLIPConfig
    patch_num: int = 13

    def setup(self):
        self.clip = CLIP(self.clip_config)
        self.ern = ERN(self.clip_config.feature_dim, patch_num=self.patch_num,
                       tme=self.clip_config.text.tme)

    # --- frozen CLIP modes -------------------------------------------------
    def encode_image(self, images):
        g, tokens = self.clip.encode_image(images)
        return jax.lax.stop_gradient(g), jax.lax.stop_gradient(tokens)

    def encode_text(self, text_ids, mode="global", visual_emb=None):
        """TME-fork-compatible surface: (global, seq) or seq-only.

        Vanilla (default): the frozen tower's features, `visual_emb`
        accepted and ignored (README.md:41 fallback). With
        `TextConfig.tme=True`, the TRAINABLE TME module (ERN subtree,
        models/ern/tme.py) conditions the frozen token features on the
        reference patches — gradients flow into TME only; the tower
        stays behind stop_gradient."""
        global_feat, seq = self.clip.encode_text(text_ids, mode="global")
        global_feat = jax.lax.stop_gradient(global_feat)
        seq = jax.lax.stop_gradient(seq)
        if self.clip_config.text.tme:
            if visual_emb is None:
                raise ValueError(
                    "TextConfig.tme=True requires visual_emb (the "
                    "reference-patch embeddings) at every encode_text "
                    "call; the vanilla path is tme=False (default)."
                )
            seq = self.ern.enhance_text(seq, visual_emb)
            # global is the (enhanced) EOT-position feature, as in the
            # vanilla tower (EOT has the highest token id)
            eot_pos = jnp.argmax(text_ids, axis=-1)
            global_feat = jnp.take_along_axis(
                seq, eot_pos[:, None, None], axis=1)[:, 0]
        if mode == "seq":
            return seq
        return global_feat, seq

    # --- trainable towers --------------------------------------------------
    def index(self, tar_feats, tar_local_feats, *, deterministic=True):
        return self.ern.index(tar_feats, tar_local_feats, deterministic=deterministic)

    def query(self, ref_feats, ref_local_feats, text_feats, text_seq_feats,
              *, deterministic=True):
        return self.ern.query(
            ref_feats, ref_local_feats, text_feats, text_seq_feats,
            deterministic=deterministic,
        )

    def train_features(self, ref_feats, ref_local_feats, text_feats, text_seq_feats,
                       tar_feats, tar_local_feats, *, deterministic=False):
        return self.ern.train_step_features(
            ref_feats, ref_local_feats, text_feats, text_seq_feats,
            tar_feats, tar_local_feats, deterministic=deterministic,
        )

    def train_forward(
        self, ref_image, tar_image, text_ids, ref_patch, tar_patch,
        *, deterministic: bool = False,
    ):
        """One training-step forward: frozen CLIP feature extraction +
        ERN mode="train" (reference hot loop, `run/train/train_fiq.py:119-133`).

        Feature plumbing matches the reference *eval* path (the trainers'
        `extract_*_features` helpers are missing upstream, SURVEY §0.2):
        query-side ref globals are raw CLIP embeddings
        (`validate_fiq.py:91-93` looks up pre-normalize index features),
        while the index tower gets L2-normalized target globals
        (`validate_fiq.py:30-31`).
        """
        # NB: concatenating ref+tar into one 2B tower pass measured
        # within chip noise of two separate passes on v5e (±15% across
        # runs, no consistent win) — the two encodes stay separate,
        # matching the reference structure 1:1.
        ref_glob, _ = self.encode_image(ref_image)
        tar_glob, _ = self.encode_image(tar_image)
        text_glob, text_seq = self.encode_text(text_ids, mode="global", visual_emb=ref_patch)
        # the trainable fusion stack runs fp32 even when the frozen
        # towers compute in bf16 (mixed-precision policy, train/state.py)
        ref_glob = ref_glob.astype(jnp.float32)
        tar_glob = tar_glob.astype(jnp.float32)
        text_glob = text_glob.astype(jnp.float32)
        text_seq = text_seq.astype(jnp.float32)
        tar_glob = tar_glob / jnp.linalg.norm(tar_glob, axis=-1, keepdims=True)
        return self.train_features(
            ref_glob, ref_patch, text_glob, text_seq, tar_glob, tar_patch,
            deterministic=deterministic,
        )

    def __call__(
        self,
        image=None,
        text=None,
        ref_feats=None,
        ref_local_feats=None,
        text_feats=None,
        text_seq_feats=None,
        tar_feats=None,
        tar_local_feats=None,
        mode: str = "train",
        deterministic: bool = True,
    ):
        if mode == "image":
            return self.encode_image(image)[0]
        if mode == "text_global":
            return self.encode_text(text, mode="global", visual_emb=ref_local_feats)[0]
        if mode == "text_seq":
            return self.encode_text(text, mode="seq", visual_emb=ref_local_feats)
        if mode == "index":
            return self.index(tar_feats, tar_local_feats, deterministic=deterministic)
        if mode == "test":
            return self.query(
                ref_feats, ref_local_feats, text_feats, text_seq_feats,
                deterministic=deterministic,
            )
        return self.train_features(
            ref_feats, ref_local_feats, text_feats, text_seq_feats,
            tar_feats, tar_local_feats, deterministic=deterministic,
        )


def merge_variables(clip_variables: dict, ern_variables: dict) -> dict:
    """Nest separately-converted CLIP and ERN variable trees under the
    composed model's module names."""
    out: dict = {"params": {}, "batch_stats": {}}
    out["params"]["clip"] = clip_variables.get("params", {})
    out["params"]["ern"] = ern_variables.get("params", {})
    if "batch_stats" in clip_variables:
        out["batch_stats"]["clip"] = clip_variables["batch_stats"]
    if "batch_stats" in ern_variables:
        out["batch_stats"]["ern"] = ern_variables["batch_stats"]
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out
