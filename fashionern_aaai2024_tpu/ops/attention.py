"""Fused multi-head attention.

Serves every attention site in the stack (reference locations in
parentheses):
  * CLIP ViT / text-transformer blocks (open_clip towers built at
    `run/train/train_fiq.py:49`): self-attention, optionally causal.
  * The fusion mini-BERT over the 1+13+77 = 91-token sequence
    (`models/fusion_model.py:157-216`).
  * The MR cross-attention, text queries → image keys/values
    (`models/fusion_model.py:18-20,44-47`).
  * RN50x4 attention-pool head.

Sequences are short (13–257 tokens), so the TPU-optimal shape is a
single-block kernel per (batch, head): scores, softmax and the value
matmul all stay in VMEM — no HBM round-trip for the S×S matrix. Inputs
are lane-padded; key-side padding is masked via the additive bias.

Training-time attention-probability dropout uses the XLA path (dropout
between two matmuls isn't worth a custom backward at these sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionern_aaai2024_tpu.ops.common import pad_axis_to, round_up, use_pallas

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    # operands stay in their storage dtype (bf16 on the MXU fast path);
    # accumulation and softmax run fp32
    q = q_ref[0]                      # [Sq, D]
    k = k_ref[0]                      # [Sk, D]
    v = v_ref[0]                      # [Sk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[:]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _mha_pallas(q, k, v, bias, scale: float, interpret: bool = False):
    """q:[BH,Sq,D] k,v:[BH,Sk,D] bias:[Sq,Sk] (already padded/masked)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sq, sk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, bias)
    return out


def _mha_ref(q, k, v, bias, scale, dropout_rate=0.0, dropout_rng=None):
    # Score storage follows the operand dtype: in fp32 (parity/eval
    # tests) everything is exact fp32; in bf16 the S×S tensor is stored
    # bf16 — the MXU accumulates bf16 matmuls in fp32 internally, and
    # the softmax computes through fp32 with bf16 reads/writes (the
    # astype pair fuses into the softmax loop). Measured on v5e this
    # halves attention time (3.5 → 1.9 ms/layer at ViT-B shapes): the
    # fp32 score tensor's HBM round-trip was the attention bottleneck.
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(scale, q.dtype)
    if bias is not None:
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v).astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scaled-dot-product attention over [B, H, S, Dh] tensors.

    `bias` is an optional additive [Sq, Sk] mask shared across batch and
    heads (this model family only needs causal / padding masks, never
    per-example masks — PlusModel's attention mask is all-ones,
    reference `models/fusion_model.py:204`).
    """
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = dh ** -0.5

    shared_bias = None
    if causal:
        causal_mask = jnp.tril(jnp.ones((sq, sk), bool))
        shared_bias = jnp.where(causal_mask, 0.0, _NEG_INF)
    if bias is not None:
        b32 = bias.astype(jnp.float32)
        shared_bias = b32 if shared_bias is None else shared_bias + b32

    train_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if force_pallas is None:
        # Shape-aware dispatch (measured on v5e): the single-block VMEM
        # kernel wins when the S×S matrix round-trip to HBM is the
        # bottleneck (long sequences) and the head dim fills the lanes;
        # at CLIP shapes (S≤257, Dh=64) XLA's fused attention is faster
        # — the kernel's Dh→128 lane padding doubles the matmul work.
        pick = use_pallas() and (sk >= 512 or dh % 128 == 0)
    else:
        pick = force_pallas
    if not pick or train_dropout:
        sb = None if shared_bias is None else shared_bias[None, None]
        return _mha_ref(q, k, v, sb, scale, dropout_rate, dropout_rng)
    if shared_bias is None:
        shared_bias = jnp.zeros((sq, sk), jnp.float32)

    # Pad to TPU tiles: Dh and Sk to lane width, Sq to sublane width.
    dp = round_up(dh, 128)
    skp = round_up(sk, 128)
    sqp = round_up(sq, 8)
    qp = pad_axis_to(pad_axis_to(q, 3, dp), 2, sqp).reshape(b * h, sqp, dp)
    kp = pad_axis_to(pad_axis_to(k, 3, dp), 2, skp).reshape(b * h, skp, dp)
    vp = pad_axis_to(pad_axis_to(v, 3, dp), 2, skp).reshape(b * h, skp, dp)
    bias_p = jnp.full((sqp, skp), _NEG_INF, jnp.float32)
    bias_p = bias_p.at[:sq, :sk].set(shared_bias)
    out = _mha_pallas(qp, kp, vp, bias_p, scale, interpret=interpret)
    return out.reshape(b, h, sqp, dp)[:, :, :sq, :dh]
