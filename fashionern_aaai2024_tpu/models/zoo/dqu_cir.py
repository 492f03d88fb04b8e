"""DQU-CIR fusion head (`models/others/DQU_CIR_Model.py:8-72`, SIGIR'24).

The reference hardwires an open_clip ViT-H-14 (laion2B) backbone; here
the head is backbone-agnostic — pass already-encoded (unnormalized)
text/image query features and target features. The ViT-H-14 weights are
not bundled (laion checkpoint, not in the reference repo either); any
registered CLIP tower works via `models.composed`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.ern.layers import torch_normalize


class DQUCIRHead(nn.Module):
    hidden_dim: int = 1024
    dropout: float = 0.5

    @nn.compact
    def __call__(self, textual_query, visual_query, *, deterministic: bool = True):
        """Gated mix of L2-normalized text/image queries
        (`DQU_CIR_Model.py:44-53`); returns the normalized query."""
        tq = torch_normalize(textual_query)
        vq = torch_normalize(visual_query)
        combined = nn.relu(
            nn.Dense(self.hidden_dim, name="combiner_fc_0")(
                jnp.concatenate([tq, vq], axis=-1)
            )
        )
        h = nn.Dropout(self.dropout, deterministic=deterministic)(combined)
        h = nn.relu(nn.Dense(self.hidden_dim, name="scaler_fc_0")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        scaler = nn.sigmoid(nn.Dense(1, name="scaler_fc_3")(h))
        return torch_normalize(scaler * tq + (1 - scaler) * vq)


def ranking_nce_loss(query, target, loss_weight: float = 10.0):
    """`DQU_CIR.ranking_nce_loss` (`DQU_CIR_Model.py:67-72`)."""
    import jax

    x = loss_weight * jnp.dot(query.astype(jnp.float32), target.astype(jnp.float32).T)
    labels = jnp.arange(x.shape[0])
    logp = jax.nn.log_softmax(x, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def _lin(sd, prefix):
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"].detach().float().numpy()).T,
        "bias": np.asarray(sd[f"{prefix}.bias"].detach().float().numpy()),
    }


def dqu_cir_from_torch(sd) -> dict:
    """Converts the head parameters (backbone excluded)."""
    return {"params": {
        "combiner_fc_0": _lin(sd, "combiner_fc.0"),
        "scaler_fc_0": _lin(sd, "scaler_fc.0"),
        "scaler_fc_3": _lin(sd, "scaler_fc.3"),
    }}
