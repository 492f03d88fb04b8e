"""ARTEMIS scoring model (`models/others/ARTEMIS_Model.py:6-93`, ICLR'22).

Explicit-Matching (EM) + Implicit-Similarity (IS) attention scores.
The reference file is broken as shipped (`from utils import l2norm`
imports a symbol that doesn't exist — SURVEY §2.8); the l2norm here is
the standard x/||x||₂ the ARTEMIS paper uses.

API: `score(r, m, t)` per-triple scores; `score_broadcast(r, m, t)`
the [Bq, Bt] score matrix (each query's attention applied to every
target).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.ern.layers import torch_normalize


class _AttentionMechanism(nn.Module):
    """MLP gate with softmax over the FEATURE axis
    (`ARTEMIS_Model.py:76-93`, `Softmax(dim=1)` on [B, d])."""

    embed_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.embed_dim, name="attention_0")(x))
        h = nn.Dense(self.embed_dim, name="attention_2")(h)
        return nn.softmax(h, axis=1)


class Artemis(nn.Module):
    clip_feature_dim: int

    def setup(self):
        self.transform_m = nn.Dense(self.clip_feature_dim, name="Transform_m")
        self.attention_em = _AttentionMechanism(self.clip_feature_dim, name="Attention_EM")
        self.attention_is = _AttentionMechanism(self.clip_feature_dim, name="Attention_IS")
        self.temperature = self.param(
            "temperature", lambda k: jnp.asarray([2.65926], jnp.float32)
        )

    @staticmethod
    def _apply_attention(a, x):
        return torch_normalize(a * x)

    def score_em(self, r, m, t):
        tr_m = torch_normalize(self.transform_m(m))
        a_em_t = self._apply_attention(self.attention_em(m), t)
        return jnp.sum(tr_m * a_em_t, axis=-1)

    def score_is(self, r, m, t):
        a = self.attention_is(m)
        return jnp.sum(
            self._apply_attention(a, r) * self._apply_attention(a, t), axis=-1
        )

    def score(self, r, m, t):
        return self.score_em(r, m, t) + self.score_is(r, m, t)

    def score_broadcast(self, r, m, t):
        """[Bq, Bt] EM+IS scores (`compute_score_broadcast_artemis`)."""
        bq, d = m.shape
        a_em = self.attention_em(m)
        tr_m = torch_normalize(self.transform_m(m))
        a_em_all_t = self._apply_attention(a_em[:, None, :], t[None, :, :])
        em = jnp.sum(tr_m[:, None, :] * a_em_all_t, axis=-1)
        a_is = self.attention_is(m)
        a_is_r = self._apply_attention(a_is, r)
        a_is_all_t = self._apply_attention(a_is[:, None, :], t[None, :, :])
        is_ = jnp.sum(a_is_r[:, None, :] * a_is_all_t, axis=-1)
        return em + is_

    def __call__(self, r, m, t, broadcast: bool = False):
        return self.score_broadcast(r, m, t) if broadcast else self.score(r, m, t)


def _lin(sd, prefix):
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"].detach().float().numpy()).T,
        "bias": np.asarray(sd[f"{prefix}.bias"].detach().float().numpy()),
    }


def artemis_from_torch(sd) -> dict:
    return {"params": {
        "Transform_m": _lin(sd, "Transform_m.0"),
        "Attention_EM": {
            "attention_0": _lin(sd, "Attention_EM.attention.0"),
            "attention_2": _lin(sd, "Attention_EM.attention.2"),
        },
        "Attention_IS": {
            "attention_0": _lin(sd, "Attention_IS.attention.0"),
            "attention_2": _lin(sd, "Attention_IS.attention.2"),
        },
        "temperature": np.asarray(sd["temperature"].detach().float().numpy()),
    }}
