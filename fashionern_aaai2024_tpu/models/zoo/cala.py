"""CaLa twin-attention compositor (`models/others/CaLa_Model.py:5-62`).

Two single-head cross-attention modules, each applied 4× (first
ref↔target, then query vs its own refined output), averaged CLS.
"""

from __future__ import annotations

import flax.linen as nn
import numpy as np

from fashionern_aaai2024_tpu.models.ern.layers import TorchMultiheadAttention


class TwinAttentionCompositor(nn.Module):
    embedding_dim: int

    def setup(self):
        self.reference_as_query_attention = TorchMultiheadAttention(
            self.embedding_dim, num_heads=1, dropout=0.0
        )
        self.target_as_query_attention = TorchMultiheadAttention(
            self.embedding_dim, num_heads=1, dropout=0.0
        )

    def __call__(self, reference_embeddings, target_embeddings,
                 *, deterministic: bool = True):
        out1 = self.reference_as_query_attention(
            reference_embeddings, target_embeddings, target_embeddings,
            deterministic=deterministic,
        )
        for _ in range(3):
            out1 = self.reference_as_query_attention(
                reference_embeddings, out1, out1, deterministic=deterministic
            )
        out2 = self.target_as_query_attention(
            target_embeddings, reference_embeddings, reference_embeddings,
            deterministic=deterministic,
        )
        for _ in range(3):
            out2 = self.target_as_query_attention(
                target_embeddings, out2, out2, deterministic=deterministic
            )
        return (out1[:, 0, :] + out2[:, 0, :]) / 2


def _mha(sd, prefix):
    return {
        "in_proj_weight": np.asarray(sd[f"{prefix}.in_proj_weight"].detach().float().numpy()),
        "in_proj_bias": np.asarray(sd[f"{prefix}.in_proj_bias"].detach().float().numpy()),
        "out_proj": {
            "kernel": np.asarray(sd[f"{prefix}.out_proj.weight"].detach().float().numpy()).T,
            "bias": np.asarray(sd[f"{prefix}.out_proj.bias"].detach().float().numpy()),
        },
    }


def cala_from_torch(sd) -> dict:
    return {"params": {
        "reference_as_query_attention": _mha(sd, "reference_as_query_attention"),
        "target_as_query_attention": _mha(sd, "target_as_query_attention"),
    }}
