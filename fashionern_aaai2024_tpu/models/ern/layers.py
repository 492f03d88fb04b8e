"""PyTorch-semantics primitives needed for checkpoint/recall parity.

The fusion stack's numerics must match the reference bit-for-bit at
eval time (north star: Recall@10/50 bit-parity on FashionIQ), so the
handful of torch idioms it relies on are reproduced exactly:

  * `F.normalize` (eps *inside* the max, 1e-12 — torch docs semantics)
  * `nn.MultiheadAttention` with packed QKV projection
    (`models/fusion_model.py:18-20`)
  * `nn.BatchNorm1d` over the *patch* axis for 3-D inputs
    (`models/fusion_model.py:106-124`: BatchNorm1d(num_region=13))
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fashionern_aaai2024_tpu.ops.attention import multi_head_attention


def torch_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """`torch.nn.functional.normalize`: x / max(||x||₂, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def sr_l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """VisualSR's custom norm: x / (||x||₂ + eps) (`fusion_model.py:136-139`)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)) + eps
    return x / n


# Xavier-uniform with zero bias — VisualSR.init_weights (`fusion_model.py:126-131`).
xavier_uniform = nn.initializers.glorot_uniform()


class TorchMultiheadAttention(nn.Module):
    """`nn.MultiheadAttention(embed_dim, num_heads, batch_first=True)`.

    Packed in-projection (single [3d, d] weight) + out projection, with
    attention-probability dropout. Inputs [B, S, d].
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, *, deterministic: bool = True):
        d, h = self.embed_dim, self.num_heads
        head_dim = d // h
        in_proj_weight = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_bias, 3, axis=0)

        def proj(x, w, b):
            return jnp.einsum("bsd,od->bso", x, w) + b

        if deterministic or self.dropout == 0.0:
            # dropout off → packed cross-attention tier: k|v packed into
            # one [B,Sk,2d] tensor, heads sliced in VMEM (Pallas at
            # dh=64 on TPU, identical XLA formula elsewhere)
            from fashionern_aaai2024_tpu.ops.attention import (
                packed_kv_cross_attention,
            )

            q_p = proj(query, wq, bq)
            kv = jnp.concatenate(
                [proj(key, wk, bk), proj(value, wv, bv)], axis=-1)
            o = packed_kv_cross_attention(q_p, kv, h)
        else:
            def split_heads(x):  # [B,S,d] -> [B,H,S,hd]
                b_, s_, _ = x.shape
                return x.reshape(b_, s_, h, head_dim).transpose(0, 2, 1, 3)

            q = split_heads(proj(query, wq, bq))
            k = split_heads(proj(key, wk, bk))
            v = split_heads(proj(value, wv, bv))
            o = multi_head_attention(
                q, k, v, dropout_rate=self.dropout,
                dropout_rng=self.make_rng("dropout"),
            )
            b_, _, sq, _ = o.shape
            o = o.transpose(0, 2, 1, 3).reshape(b_, sq, d)
        out = nn.Dense(d, name="out_proj")(o)
        return out


class TorchBatchNorm(nn.Module):
    """`nn.BatchNorm1d` semantics (momentum 0.1, eps 1e-5).

    `feature_axis` selects the channel axis: 1 for 3-D inputs
    (BatchNorm1d over patches) and -1 for 2-D inputs.
    """

    num_features: int
    feature_axis: int = -1
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            axis=self.feature_axis,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            name="bn",
        )(x)
