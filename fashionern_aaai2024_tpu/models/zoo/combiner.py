"""CLIP4Cir Combiner, VTF, and AttentionPooling fusion heads.

References:
  * Combiner (CVPR'22)  — `models/others/Combiner_Model.py:6-70`
  * VTFModule           — `models/others/VTF_Model.py:6-112`
  * AttentionPooling    — `models/others/attention_fusion_model.py:6-23`
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fashionern_aaai2024_tpu.models.ern.layers import torch_normalize


def _drop(x, rate, deterministic):
    return nn.Dropout(rate, deterministic=deterministic)(x)


class Clip4CirCombiner(nn.Module):
    """Gated residual mix over 2·dim concatenated CLIP features."""

    clip_feature_dim: int
    projection_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, image_features, text_features, *, deterministic: bool = True):
        tp = _drop(nn.relu(nn.Dense(self.projection_dim, name="text_projection_layer")(
            text_features)), 0.5, deterministic)
        ip = _drop(nn.relu(nn.Dense(self.projection_dim, name="image_projection_layer")(
            image_features)), 0.5, deterministic)
        raw = jnp.concatenate([tp, ip], axis=-1)
        combined = _drop(nn.relu(nn.Dense(self.hidden_dim, name="combiner_layer")(raw)),
                         0.5, deterministic)
        h = nn.relu(nn.Dense(self.hidden_dim, name="dynamic_scalar_0")(raw))
        h = _drop(h, 0.5, deterministic)
        scalar = nn.sigmoid(nn.Dense(1, name="dynamic_scalar_3")(h))
        out = (
            nn.Dense(2 * self.clip_feature_dim, name="output_layer")(combined)
            + scalar * text_features
            + (1 - scalar) * image_features
        )
        return torch_normalize(out)


class VTFModule(nn.Module):
    """Combiner + per-feature self-gating branch.

    Reference quirks preserved for parity (`VTF_Model.py:92-99`): the
    image branch reuses `text_mlp` (not `image_mlp` — `image_mlp` is
    dead weight) and `dropout11` for both streams; `Softmax(dim=-1)`
    over a [B, 1] gate is identically 1."""

    clip_feature_dim: int
    projection_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, image_features, text_features, *, deterministic: bool = True):
        d2 = 2 * self.clip_feature_dim

        def gate_mlp(x, name):
            h = nn.relu(nn.Dense(d2, name=f"{name}_0")(x))
            h = _drop(h, 0.5, deterministic)
            g = nn.Dense(1, name=f"{name}_3")(h)
            return nn.softmax(g, axis=-1)        # [B,1] softmax ≡ 1.0

        # dead parameters kept so torch checkpoints convert 1:1
        _ = gate_mlp(image_features, "image_mlp")

        tp = _drop(nn.relu(nn.Dense(self.projection_dim, name="text_projection_layer")(
            text_features)), 0.5, deterministic)
        ip = _drop(nn.relu(nn.Dense(self.projection_dim, name="image_projection_layer")(
            image_features)), 0.5, deterministic)
        raw = jnp.concatenate([tp, ip], axis=-1)
        combined = _drop(nn.relu(nn.Dense(self.hidden_dim, name="combiner_layer")(raw)),
                         0.5, deterministic)
        h = nn.relu(nn.Dense(self.hidden_dim, name="dynamic_scalar_0")(raw))
        h = _drop(h, 0.5, deterministic)
        scalar = nn.sigmoid(nn.Dense(1, name="dynamic_scalar_3")(h))

        text_sa = _drop(nn.relu(text_features * gate_mlp(text_features, "text_mlp")),
                        0.5, deterministic)
        image_sa = _drop(nn.relu(image_features * gate_mlp(image_features, "text_mlp_shared")),
                         0.5, deterministic)
        raw2 = jnp.concatenate([text_sa, image_sa], axis=-1)
        combined2 = _drop(nn.relu(nn.Dense(self.hidden_dim, name="combiner_layer2")(raw2)),
                          0.5, deterministic)
        h2 = nn.relu(nn.Dense(self.hidden_dim, name="dynamic_scalar2_0")(raw2))
        h2 = _drop(h2, 0.5, deterministic)
        scalar2 = nn.sigmoid(nn.Dense(1, name="dynamic_scalar2_3")(h2))

        out = (
            nn.Dense(d2, name="output_layer")(combined)
            + scalar * text_features
            + (1 - scalar) * image_features
            + nn.Dense(d2, name="output_layer2")(combined2)
            + scalar2 * text_sa
            + (1 - scalar2) * image_sa
        )
        return torch_normalize(out)


class AttentionPooling(nn.Module):
    """Softmax pooling over T embeddings
    (`attention_fusion_model.py:6-23`)."""

    emb_dim: int
    emb_num: int

    @nn.compact
    def __call__(self, inputs):  # [B, T, H]
        b = inputs.shape[0]
        energy = nn.Dense(self.emb_num, name="projection")(inputs.reshape(b, -1))
        weights = nn.softmax(energy, axis=1)
        return jnp.sum(inputs * weights[..., None], axis=1)


# --- torch state-dict converters -----------------------------------------

def _lin(sd, prefix):
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"].detach().float().numpy()).T,
        "bias": np.asarray(sd[f"{prefix}.bias"].detach().float().numpy()),
    }


def combiner_from_torch(sd) -> dict:
    return {"params": {
        "text_projection_layer": _lin(sd, "text_projection_layer"),
        "image_projection_layer": _lin(sd, "image_projection_layer"),
        "combiner_layer": _lin(sd, "combiner_layer"),
        "output_layer": _lin(sd, "output_layer"),
        "dynamic_scalar_0": _lin(sd, "dynamic_scalar.0"),
        "dynamic_scalar_3": _lin(sd, "dynamic_scalar.3"),
    }}


def vtf_from_torch(sd) -> dict:
    p = {
        "text_projection_layer": _lin(sd, "text_projection_layer"),
        "image_projection_layer": _lin(sd, "image_projection_layer"),
        "combiner_layer": _lin(sd, "combiner_layer"),
        "output_layer": _lin(sd, "output_layer"),
        "dynamic_scalar_0": _lin(sd, "dynamic_scalar.0"),
        "dynamic_scalar_3": _lin(sd, "dynamic_scalar.3"),
        "combiner_layer2": _lin(sd, "combiner_layer2"),
        "output_layer2": _lin(sd, "output_layer2"),
        "dynamic_scalar2_0": _lin(sd, "dynamic_scalar2.0"),
        "dynamic_scalar2_3": _lin(sd, "dynamic_scalar2.3"),
        "image_mlp_0": _lin(sd, "image_mlp.0"),
        "image_mlp_3": _lin(sd, "image_mlp.3"),
        "text_mlp_0": _lin(sd, "text_mlp.0"),
        "text_mlp_3": _lin(sd, "text_mlp.3"),
    }
    # the image stream calls text_mlp in the reference (`VTF_Model.py:96-98`)
    p["text_mlp_shared_0"] = p["text_mlp_0"]
    p["text_mlp_shared_3"] = p["text_mlp_3"]
    return {"params": p}


def attention_pooling_from_torch(sd) -> dict:
    return {"params": {"projection": _lin(sd, "projection")}}
