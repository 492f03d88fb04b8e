"""Pre-LN transformer blocks shared by the CLIP ViT and text towers.

Matches open_clip's `ResidualAttentionBlock`:
  x = x + attn(ln_1(x));  x = x + mlp(ln_2(x)),  mlp = c_fc → act → c_proj
Attention is torch-`nn.MultiheadAttention`-style packed QKV. All
attention lowers to the fused Pallas kernel (`ops.attention`); layernorms
to the fused LN kernel.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fashionern_aaai2024_tpu.ops.attention import (
    multi_head_attention,
)
from fashionern_aaai2024_tpu.ops.block import transformer_block
from fashionern_aaai2024_tpu.ops.layernorm import layer_norm
from fashionern_aaai2024_tpu.ops.mlp import mlp_subblock
from fashionern_aaai2024_tpu.ops.qmatmul import int8_matmul
from fashionern_aaai2024_tpu.ops.qmlp import (
    int8_attention_subblock, int8_mlp_subblock,
)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def get_activation(name: str):
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name!r}")


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, scale, bias, eps=self.eps)


class MaybeQuantDense(nn.Module):
    """nn.Dense-compatible params (kernel [in,out], bias [out] — the
    checkpoint converter sees no difference) with an int8 serving path
    (`ops.qmatmul`, --quantize-towers)."""

    features: int
    quantize: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.quantize:
            return int8_matmul(x, kernel, bias)
        return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


class _LNParams(nn.Module):
    """Param holder with LayerNorm's tree names (scale, bias) — lets the
    whole-sub-block kernel consume the raw parameters while keeping the
    checkpoint tree identical to the module-based layout."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    """Param holder with nn.Dense's tree names (kernel [in,out], bias)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.in_features, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    activation: str = "gelu"
    causal: bool = False
    quantize_mlp: bool = False

    @nn.compact
    def __call__(self, x):  # [B, S, W]
        b, s, w = x.shape
        h = self.heads
        head_dim = w // h

        ln1_scale, ln1_bias = _LNParams(w, name="ln_1")()
        in_proj_weight = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * w, w)
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * w,))
        out_kernel, out_bias = _DenseParams(w, w, name="out_proj")()
        if head_dim == 64 and w % 128 == 0 and not self.quantize_mlp:
            # whole-block fusion tier: BOTH halves in one kernel when
            # all four weight matrices fit VMEM (text tower W=512);
            # wider towers fall back inside transformer_block to the
            # attention + MLP sub-block kernel pair (ops/block.py)
            ln2_scale, ln2_bias = _LNParams(w, name="ln_2")()
            fc_kernel, fc_bias = _DenseParams(w, 4 * w, name="c_fc")()
            proj_kernel, proj_bias = _DenseParams(4 * w, w, name="c_proj")()
            return transformer_block(
                x, ln1_scale, ln1_bias, in_proj_weight.T, in_proj_bias,
                out_kernel, out_bias, ln2_scale, ln2_bias, fc_kernel,
                fc_bias, proj_kernel, proj_bias, h, causal=self.causal,
                activation=self.activation,
            )
        if head_dim == 64 and w % 128 == 0:
            # int8 serving path: qkv + out PROJECTIONS run int8 (2× MXU
            # rate); the attention math stays bf16 — quantized q/k
            # scores would compound error (ops/qmlp.py). (quantize_mlp
            # is necessarily True here: the non-quantized kernel-shape
            # case returned via the whole-block tier above. The bf16
            # attention_subblock tier lives inside transformer_block.)
            x = int8_attention_subblock(
                x, ln1_scale, ln1_bias, in_proj_weight.T, in_proj_bias,
                out_kernel, out_bias, h, causal=self.causal,
            )
        else:
            y = layer_norm(x, ln1_scale, ln1_bias)
            qkv = jnp.einsum("bsd,od->bso", y, in_proj_weight) + in_proj_bias
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def split_heads(t):
                return t.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)

            o = multi_head_attention(
                split_heads(q), split_heads(k), split_heads(v), causal=self.causal
            )
            o = o.transpose(0, 2, 1, 3).reshape(b, s, w)
            x = x + (o @ out_kernel.astype(o.dtype) + out_bias.astype(o.dtype))

        ln2_scale, ln2_bias = _LNParams(w, name="ln_2")()
        fc_kernel, fc_bias = _DenseParams(w, 4 * w, name="c_fc")()
        proj_kernel, proj_bias = _DenseParams(4 * w, w, name="c_proj")()
        if self.quantize_mlp:
            # int8 serving path (--quantize-towers): LN + both int8
            # matmuls + activation + residual fused into one kernel,
            # int8 weights VMEM-resident (ops/qmlp.py; identical-
            # semantics XLA fallback off-TPU)
            return int8_mlp_subblock(
                x, ln2_scale, ln2_bias, fc_kernel, fc_bias, proj_kernel,
                proj_bias, activation=self.activation,
            )
        # LN₂ + c_fc + activation + c_proj + residual in ONE kernel —
        # the MLP is 2/3 of the block's FLOPs and its HBM traffic
        # (hidden [B,S,4W] round-trips) set the r2 trunk's 126-vs-197
        # TF/s gap (ops/mlp.py; identical-formula XLA fallback off-TPU)
        return mlp_subblock(
            x, ln2_scale, ln2_bias, fc_kernel, fc_bias, proj_kernel,
            proj_bias, activation=self.activation,
        )


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    activation: str = "gelu"
    causal: bool = False
    quantize_mlp: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.activation, self.causal,
                self.quantize_mlp, name=f"resblock_{i}",
            )(x)
        return x
