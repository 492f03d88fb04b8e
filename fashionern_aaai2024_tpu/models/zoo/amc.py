"""AMC dynamic-routing fusion (`models/others/AMC_Model.py:16-194`).

Three cells (Rescell/GlobalCell/StyleCell) mixed by a sigmoid Router
over [region, sentence] features, stacked in two
DynamicInteraction layers; plus the unrouted Ensemble variant.

Inputs follow the reference: rgn [B, K, d] region features, img [B, d]
global image, wrd [B, T, d] word features, stc [B, d] sentence feature
(img/wrd/stc_lens are unused by the cells that consume them only via
signature — kept for API parity).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _torch_layer_norm(x, eps=1e-5):
    """LayerNorm(elementwise_affine=False)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


class Router(nn.Module):
    """Sigmoid path gates (`AMC_Model.py:63-77`) — NB despite the
    `path_prob` name it's an independent sigmoid per cell, not softmax."""

    num_out_path: int
    embed_size: int
    hid: int

    @nn.compact
    def __call__(self, x):                      # [B, K, 2d]
        x = jnp.mean(x, axis=-2)
        h = nn.Dense(self.hid, use_bias=False, name="mlp_0")(x)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.num_out_path, use_bias=False, name="mlp_3")(h)
        return nn.sigmoid(h)                    # [B, num_cells]


class Rescell(nn.Module):
    """NIN cell: affine-free LayerNorm (`AMC_Model.py:91-98`)."""

    embed_size: int

    def __call__(self, rgn):
        return _torch_layer_norm(rgn)


class StyleCell(nn.Module):
    """GTN cell: FiLM-style sentence modulation (`AMC_Model.py:99-115`)."""

    embed_size: int

    @nn.compact
    def __call__(self, rgn, img, wrd, stc, stc_lens=None):
        gammas = nn.Dense(self.embed_size, name="fc_gamma_0")(stc)[:, None, :]
        betas = nn.Dense(self.embed_size, name="fc_beta_0")(stc)[:, None, :]
        return _torch_layer_norm(rgn * gammas + betas)


class SelfAttentionCell(nn.Module):
    """Pre-norm 8-head self-attention + FF (`AMC_Model.py:178-194`).
    NB the residual is `att + ff(norm2(att))` — the attention output,
    not the input, carries the skip (reference semantics)."""

    embed_size: int

    @nn.compact
    def __call__(self, local_emb):
        h = 8
        d = self.embed_size
        head = d // h
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(local_emb)
        q = nn.Dense(d, name="att_q")(x)
        k = nn.Dense(d, name="att_k")(x)
        v = nn.Dense(d, name="att_v")(x)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, h, head).transpose(0, 2, 1, 3)

        s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / np.sqrt(head)
        p = nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v))
        b, _, sq, _ = o.shape
        att = o.transpose(0, 2, 1, 3).reshape(b, sq, d)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(att)
        ff = nn.Dense(d, name="ff_2")(nn.relu(nn.Dense(int(d * 0.5), name="ff_1")(y)))
        return att + ff


class GlobalCell(nn.Module):
    """CRN cell (`AMC_Model.py:118-132`)."""

    embed_size: int

    @nn.compact
    def __call__(self, rgn, img, wrd, stc, stc_lens=None):
        k = rgn.shape[1]
        stc_cat = jnp.broadcast_to(stc[:, None, :], (stc.shape[0], k, stc.shape[-1]))
        x = jnp.concatenate([rgn, stc_cat], axis=-1)
        x = nn.Dense(self.embed_size, name="linear")(x)
        out = SelfAttentionCell(self.embed_size, name="SA")(x)
        return _torch_layer_norm(out)


class DynamicInteractionLayer(nn.Module):
    embed_size: int
    hid_router: int
    num_cells: int = 3

    @nn.compact
    def __call__(self, rgn, img, wrd, stc, stc_lens=None):
        k = rgn.shape[1]
        stc_cat = jnp.broadcast_to(stc[:, None, :], (stc.shape[0], k, stc.shape[-1]))
        path_in = jnp.concatenate([rgn, stc_cat], axis=-1)
        path_prob = Router(self.num_cells, self.embed_size, self.hid_router,
                           name="router")(path_in)
        embs = jnp.stack([
            Rescell(self.embed_size, name="ric")(rgn),
            GlobalCell(self.embed_size, name="glo")(rgn, img, wrd, stc, stc_lens),
            StyleCell(self.embed_size, name="sty")(rgn, img, wrd, stc, stc_lens),
        ], axis=1)                               # [B, 3, K, d]
        out = jnp.sum(embs * path_prob[:, :, None, None], axis=1)
        return out, path_prob


class AMCInteractionModule(nn.Module):
    """Two stacked routing layers (`AMC_Model.py:16-28`)."""

    embed_size: int
    hid_router: int

    @nn.compact
    def __call__(self, rgn, img, wrd, stc, stc_lens=None):
        l0 = DynamicInteractionLayer(self.embed_size, self.hid_router,
                                     name="dynamic_itr_l0")
        l1 = DynamicInteractionLayer(self.embed_size, self.hid_router,
                                     name="dynamic_itr_l1")
        emb1, p1 = l0(rgn, img, wrd, stc, stc_lens)
        emb2, p2 = l1(emb1, img, wrd, stc, stc_lens)
        return emb1, emb2, p1, p2


class AMCEnsemble(nn.Module):
    """Unrouted sum of the three cells (`AMC_Model.py:79-88`)."""

    embed_size: int

    @nn.compact
    def __call__(self, rgn, img, wrd, stc, stc_lens=None):
        return (
            Rescell(self.embed_size, name="ric")(rgn)
            + GlobalCell(self.embed_size, name="glo")(rgn, img, wrd, stc, stc_lens)
            + StyleCell(self.embed_size, name="sty")(rgn, img, wrd, stc, stc_lens)
        )


# --- torch converters ------------------------------------------------------

def _lin(sd, prefix, bias=True):
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"].detach().float().numpy()).T}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"].detach().float().numpy())
    return out


def _ln(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"].detach().float().numpy()),
        "bias": np.asarray(sd[f"{prefix}.bias"].detach().float().numpy()),
    }


def _sa_cell(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "att_q": _lin(sd, f"{prefix}.att_layer.linears.0"),
        "att_k": _lin(sd, f"{prefix}.att_layer.linears.1"),
        "att_v": _lin(sd, f"{prefix}.att_layer.linears.2"),
        "ff_1": _lin(sd, f"{prefix}.feed_forward_layer.fc1"),
        "ff_2": _lin(sd, f"{prefix}.feed_forward_layer.fc2"),
    }


def _itr_layer(sd, prefix):
    return {
        "router": {
            "mlp_0": _lin(sd, f"{prefix}.router.mlp.0", bias=False),
            "mlp_1": _ln(sd, f"{prefix}.router.mlp.1"),
            "mlp_3": _lin(sd, f"{prefix}.router.mlp.3", bias=False),
        },
        "glo": {
            "linear": _lin(sd, f"{prefix}.glo.linear"),
            "SA": _sa_cell(sd, f"{prefix}.glo.SA"),
        },
        "sty": {
            "fc_gamma_0": _lin(sd, f"{prefix}.sty.fc_gamma.0"),
            "fc_beta_0": _lin(sd, f"{prefix}.sty.fc_beta.0"),
        },
    }


def amc_interaction_from_torch(sd) -> dict:
    return {"params": {
        "dynamic_itr_l0": _itr_layer(sd, "dynamic_itr_l0"),
        "dynamic_itr_l1": _itr_layer(sd, "dynamic_itr_l1"),
    }}
