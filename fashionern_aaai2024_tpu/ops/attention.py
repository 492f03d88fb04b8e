"""Fused multi-head attention — tiered Pallas kernels + XLA fallback.

Serves every attention site in the stack (reference locations in
parentheses):
  * CLIP ViT / text-transformer blocks (open_clip towers built at
    `run/train/train_fiq.py:49`): self-attention, optionally causal.
  * The fusion mini-BERT over the 1+13+77 = 91-token sequence
    (`models/fusion_model.py:157-216`).
  * The MR cross-attention, text queries → image keys/values
    (`models/fusion_model.py:18-20,44-47`).
  * RN50x4 attention-pool head.

Sequences are short (13–257 tokens): the whole S×S score matrix of a
head fits in VMEM and need never round-trip to HBM. The hard lesson of
the measured ledger (BASELINE.md "r2 attention-kernel ledger") is that
at these shapes the operand LAYOUT cost dominates kernel-internal
efficiency, so the production tiers fuse progressively more of the
block to avoid materializing layouts at all:

  1. `attention_subblock` — LN + QKV projection + per-head attention +
     out-projection + residual in ONE program per image; only x in /
     x out touches HBM, projection weights stay VMEM-resident across
     the grid. Production dispatch for bf16 self-attention with Dh=64
     (both CLIP towers). 2.00 vs 2.91 ms/layer against the XLA
     sub-block; bench 2810 → 4058 img/s across r2.
  2. `packed_qkv_self_attention` — attention straight from a packed
     [B,S,3W] qkv tensor, heads sliced in VMEM. fp32 tier (verified
     BIT-EXACT vs XLA on-chip at S=197) and the sub-block's fallback.
  3. `multi_head_attention` ([B,H,S,Dh] form) — grouped multi-(b,h)
     per-program kernel for long sequences / lane-aligned heads; XLA
     at CLIP shapes (this call form forces materializing lane-padded
     operands that XLA's own fusion avoids — measured net loss).
  4. XLA reference formula — off-TPU, odd shapes, and every
     dropout-bearing site.

All kernels carry custom VJPs (XLA-ref backward, recomputed scores) so
gradient-bearing sites (frozen-tower forwards in the train step, fusion
attention with dropout off) can use them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionern_aaai2024_tpu.ops.common import round_up, use_pallas

_NEG_INF = -1e30

# VMEM budget for one grid program's blocks (q/k/v/out + fp32 score and
# probability temporaries per unrolled pair); 16 MB physical, leave room
# for pipelining the next block in.
_VMEM_BUDGET = 12 * 1024 * 1024
_MAX_GROUP = 32


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float, g: int):
    # operands stay in their storage dtype (bf16 on the MXU fast path);
    # accumulation and softmax run fp32. Static unroll over the G
    # (batch, head) pairs: dots issue back-to-back on the MXU with no
    # per-pair program launch.
    for i in range(g):
        q = q_ref[0, i]                   # [Sqp, Dp]
        k = k_ref[0, i]                   # [Skp, Dp]
        v = v_ref[0, i]
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
        out_ref[0, i] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "g", "interpret"))
def _mha_pallas(q, k, v, bias, scale: float, g: int, interpret: bool = False):
    """q:[BH,Sq,Dh] k,v:[BH,Sk,Dh] bias:[Sq,Sk] — logical (unpadded)
    shapes; Mosaic masks the ragged tile edges."""
    bh, sq, dh = q.shape
    sk = k.shape[1]
    qg = q.reshape(bh // g, g, sq, dh)
    kg = k.reshape(bh // g, g, sk, dh)
    vg = v.reshape(bh // g, g, sk, dh)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, g=g),
        out_shape=jax.ShapeDtypeStruct((bh // g, g, sq, dh), q.dtype),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((1, g, sq, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, sk, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, sk, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sq, sk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, sq, dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qg, kg, vg, bias)
    return out.reshape(bh, sq, dh)


def _pick_group(bh: int, sqp: int, skp: int, dp: int, esize: int) -> int:
    """Largest divisor of bh (≤ _MAX_GROUP) whose blocks fit the VMEM
    budget; per-pair cost: q/out [sqp,dp] + k/v [skp,dp] in element
    dtype, plus fp32 score and probability temporaries [sqp,skp]."""
    per_pair = (2 * sqp * dp + 2 * skp * dp) * esize + 2 * sqp * skp * 4
    cap = max(1, min(_MAX_GROUP, _VMEM_BUDGET // max(per_pair, 1)))
    for g in range(cap, 0, -1):
        if bh % g == 0:
            return g
    return 1


def _packed_kernel(qkv_ref, bias_ref, out_ref, *, scale: float, gb: int,
                   heads: int, w: int):
    dh = w // heads
    for i in range(gb):
        for h in range(heads):
            q = qkv_ref[i, :, dh * h: dh * (h + 1)]          # [S, dh]
            k = qkv_ref[i, :, w + dh * h: w + dh * (h + 1)]
            v = qkv_ref[i, :, 2 * w + dh * h: 2 * w + dh * (h + 1)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias_ref[:]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[i, :, dh * h: dh * (h + 1)] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "gb", "heads", "interpret"))
def _packed_pallas(qkv, bias, scale: float, gb: int, heads: int,
                   interpret: bool = False):
    b, s, w3 = qkv.shape
    w = w3 // 3
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, gb=gb, heads=heads, w=w),
        out_shape=jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, s, w3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, bias)


def _packed_ref(qkv, bias, scale, heads):
    """Pure-XLA equivalent of the packed kernel (dispatch fallback and
    custom-VJP backward)."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    dh = w // heads

    def split(x):
        return x.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(qkv[..., :w]), split(qkv[..., w:2 * w]), split(qkv[..., 2 * w:])
    o = _mha_ref(q, k, v, bias[None, None], scale)
    return o.transpose(0, 2, 1, 3).reshape(b, s, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _packed_diff(qkv, bias, scale, heads, gb, interpret):
    return _packed_pallas(qkv, bias, scale, gb, heads, interpret)


def _packed_diff_fwd(qkv, bias, scale, heads, gb, interpret):
    return _packed_diff(qkv, bias, scale, heads, gb, interpret), (qkv, bias)


def _packed_diff_bwd(scale, heads, gb, interpret, res, grad):
    qkv, bias = res
    _, vjp = jax.vjp(lambda a, b_: _packed_ref(a, b_, scale, heads), qkv, bias)
    return vjp(grad)


_packed_diff.defvjp(_packed_diff_fwd, _packed_diff_bwd)


def packed_qkv_self_attention(
    qkv: jnp.ndarray,
    heads: int,
    *,
    causal: bool = False,
    scale: float | None = None,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Self-attention straight from the QKV projection output.

    qkv: [B, S, 3W] (q | k | v each W = heads·dh wide) → [B, S, W].
    The head split/merge happens INSIDE the kernel via lane slices, so
    the [B,H,S,Dh] operand layout (whose materialization made the
    grouped kernel a net loss in-model — 48.8 ms trunk vs 45.9 XLA) is
    never built. Measured v5e ViT-B-16 (B=128, S=197): 1.65 ms/layer vs
    XLA's ~2.0 in-model. Differentiable (XLA-ref backward)."""
    b, s, w3 = qkv.shape
    w = w3 // 3
    dh = w // heads
    if scale is None:
        scale = dh ** -0.5
    bias = (
        jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, _NEG_INF).astype(jnp.float32)
        if causal else jnp.zeros((s, s), jnp.float32)
    )
    if force_pallas is None:
        # dh=64 covers both CLIP towers (768/12, 512/8); larger batches
        # amortize; tiny workloads stay on XLA. s>=128: at tower S=197
        # the kernel wins (1.65 vs ~2.0 ms/layer in-model, r2 ledger);
        # at the fusion mini-BERT's S=91 XLA wins by ~1.5% (r3 ledger:
        # DVR d=512 B=256, 8.77 ms XLA vs 8.90 kernel).
        pick = (use_pallas() and dh == 64 and w % 128 == 0
                and b * heads >= 64 and s >= 128)
    else:
        pick = force_pallas
    if not pick:
        return _packed_ref(qkv, bias, scale, heads)
    return _packed_diff(qkv, bias, scale, heads, 1, interpret)


def _packed_cross_kernel(q_ref, kv_ref, bias_ref, out_ref, *, scale: float,
                         gb: int, heads: int, w: int):
    dh = w // heads
    for i in range(gb):
        for h in range(heads):
            q = q_ref[i, :, dh * h: dh * (h + 1)]            # [Sq, dh]
            k = kv_ref[i, :, dh * h: dh * (h + 1)]           # [Sk, dh]
            v = kv_ref[i, :, w + dh * h: w + dh * (h + 1)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias_ref[:]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[i, :, dh * h: dh * (h + 1)] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "gb", "heads",
                                             "interpret"))
def _packed_cross_pallas(q, kv, bias, scale: float, gb: int, heads: int,
                         interpret: bool = False):
    b, sq, w = q.shape
    sk = kv.shape[1]
    return pl.pallas_call(
        functools.partial(_packed_cross_kernel, scale=scale, gb=gb,
                          heads=heads, w=w),
        out_shape=jax.ShapeDtypeStruct((b, sq, w), q.dtype),
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, sq, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, sk, 2 * w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sq, sk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, sq, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, kv, bias)


def _packed_cross_ref(q, kv, bias, scale, heads):
    b, sq, w = q.shape
    sk = kv.shape[1]
    dh = w // heads

    def split(x):
        return x.reshape(b, x.shape[1], heads, dh).transpose(0, 2, 1, 3)

    o = _mha_ref(split(q), split(kv[..., :w]), split(kv[..., w:]),
                 bias[None, None], scale)
    return o.transpose(0, 2, 1, 3).reshape(b, sq, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _packed_cross_diff(q, kv, bias, scale, heads, gb, interpret):
    return _packed_cross_pallas(q, kv, bias, scale, gb, heads, interpret)


def _packed_cross_diff_fwd(q, kv, bias, scale, heads, gb, interpret):
    return _packed_cross_diff(q, kv, bias, scale, heads, gb, interpret), \
        (q, kv, bias)


def _packed_cross_diff_bwd(scale, heads, gb, interpret, res, grad):
    q, kv, bias = res
    _, vjp = jax.vjp(
        lambda q_, kv_, b_: _packed_cross_ref(q_, kv_, b_, scale, heads),
        q, kv, bias)
    return vjp(grad)


_packed_cross_diff.defvjp(_packed_cross_diff_fwd, _packed_cross_diff_bwd)


def packed_kv_cross_attention(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    heads: int,
    *,
    scale: float | None = None,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cross-attention straight from packed projection outputs.

    q: [B, Sq, W] (query projection output); kv: [B, Sk, 2W] (k | v);
    → [B, Sq, W]. The cross-attention sibling of
    `packed_qkv_self_attention` for the fusion stack's MR cross-attention
    (text queries → image keys, reference `models/fusion_model.py:44-47`)
    and the RN50x4 attention-pool head: heads are sliced in VMEM, so the
    [B,H,S,Dh] operand layout never materializes. Differentiable
    (XLA-ref backward). Dropout-bearing callers use the XLA path
    (`multi_head_attention`)."""
    b, sq, w = q.shape
    dh = w // heads
    if scale is None:
        scale = dh ** -0.5
    bias = jnp.zeros((sq, kv.shape[1]), jnp.float32)
    if force_pallas is None:
        # Measured, final position (r3 ledger, v5e): at every current
        # cross-attention site the sequences are tiny (DVR Sq=77/Sk=13,
        # RN attnpool Sq=1/Sk=82) and XLA wins or ties — attnpool module
        # A/B: B=64 kernel 2.88 vs XLA 3.03 ms (kernel +5%), B=128
        # kernel 4.56 vs XLA 3.48 ms (XLA +31%); DVR-level deltas are
        # inside chip noise. Production batches are ≥128, so the XLA
        # formula is the dispatch; the kernel stays for force_pallas
        # benchmarking and future long-seq cross shapes.
        pick = False
    else:
        pick = force_pallas
    if not pick:
        return _packed_cross_ref(q, kv, bias, scale, heads)
    return _packed_cross_diff(q, kv, bias, scale, heads, 1, interpret)


def _qkv_fused_kernel(x_ref, w_ref, b_ref, bias_ref, out_ref, *,
                      scale: float, heads: int, w: int):
    dh = w // heads
    x = x_ref[0]                                        # [S, W] (post-LN)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    qkv = (jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b_ref[:]).astype(x.dtype)                       # [S, 3W]
    for h in range(heads):
        q = qkv[:, dh * h: dh * (h + 1)]
        k = qkv[:, w + dh * h: w + dh * (h + 1)]
        v = qkv[:, 2 * w + dh * h: 2 * w + dh * (h + 1)]
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
        out_ref[0, :, dh * h: dh * (h + 1)] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "interpret"))
def _qkv_fused_pallas(x, w_qkv, b_qkv, bias, scale: float, heads: int,
                      interpret: bool = False):
    b, s, w = x.shape
    return pl.pallas_call(
        functools.partial(_qkv_fused_kernel, scale=scale, heads=heads, w=w),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # constant index maps: the projection weights are fetched
            # once and stay VMEM-resident across the whole grid
            pl.BlockSpec((w, 3 * w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w_qkv, b_qkv, bias)


def _qkv_fused_ref(x, w_qkv, b_qkv, bias, scale, heads):
    qkv = jnp.einsum("bsw,wo->bso", x, w_qkv) + b_qkv
    return _packed_ref(qkv, bias, scale, heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _qkv_fused_diff(x, w_qkv, b_qkv, bias, scale, heads, interpret):
    return _qkv_fused_pallas(x, w_qkv, b_qkv, bias, scale, heads, interpret)


def _qkv_fused_diff_fwd(x, w_qkv, b_qkv, bias, scale, heads, interpret):
    return (_qkv_fused_diff(x, w_qkv, b_qkv, bias, scale, heads, interpret),
            (x, w_qkv, b_qkv, bias))


def _qkv_fused_diff_bwd(scale, heads, interpret, res, grad):
    x, w_qkv, b_qkv, bias = res
    _, vjp = jax.vjp(
        lambda a, w_, b_, m_: _qkv_fused_ref(a, w_, b_, m_, scale, heads),
        x, w_qkv, b_qkv, bias,
    )
    return vjp(grad)


_qkv_fused_diff.defvjp(_qkv_fused_diff_fwd, _qkv_fused_diff_bwd)


def fused_qkv_self_attention(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    heads: int,
    *,
    causal: bool = False,
    scale: float | None = None,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """QKV projection + self-attention in ONE kernel.

    x: [B, S, W] post-LN activations; w_qkv: [W, 3W]; b_qkv: [3W].
    The [B,S,3W] qkv tensor never exists in HBM (~232 MB/layer saved at
    ViT-B-16 B=128) and the projection weights stay VMEM-resident across
    the grid. Measured v5e bf16: 2.04 ms/layer vs 2.30 for XLA-matmul +
    packed kernel. Dispatched for bf16 only: the in-kernel fp32 matmul
    shows ~2e-4 deviation from XLA's HIGHEST path, which fp32 parity
    runs should not absorb (bf16 noise floor is ~40× larger, so serving
    is unaffected). Differentiable (XLA-ref backward)."""
    b, s, w = x.shape
    dh = w // heads
    if scale is None:
        scale = dh ** -0.5
    bias = (
        jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, _NEG_INF).astype(jnp.float32)
        if causal else jnp.zeros((s, s), jnp.float32)
    )
    if force_pallas is None:
        pick = (use_pallas() and x.dtype == jnp.bfloat16 and dh == 64
                and w % 128 == 0 and b * heads >= 64)
    else:
        pick = force_pallas
    if not pick:
        # two-stage fallback: XLA projection + packed attention kernel
        # (which itself falls back to pure XLA off-TPU / at odd shapes)
        qkv = jnp.einsum("bsw,wo->bso", x, w_qkv) + b_qkv
        return packed_qkv_self_attention(qkv, heads, causal=causal,
                                         scale=scale, interpret=interpret)
    return _qkv_fused_diff(x, w_qkv, b_qkv, bias, scale, heads, interpret)


def _subblock_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, wo_ref, bo_ref,
                     bias_ref, out_ref, *, scale: float, heads: int, w: int,
                     eps: float):
    dh = w // heads
    x = x_ref[0]                                        # [S, W] raw
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
         + be_ref[:].astype(jnp.float32)).astype(x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    qkv = (jax.lax.dot_general(
        y, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b_ref[:]).astype(x.dtype)
    heads_out = []
    for h in range(heads):
        q = qkv[:, dh * h: dh * (h + 1)]
        k = qkv[:, w + dh * h: w + dh * (h + 1)]
        v = qkv[:, 2 * w + dh * h: 2 * w + dh * (h + 1)]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        heads_out.append(jax.lax.dot_general(
            (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
    attn = jnp.concatenate(heads_out, axis=-1)
    proj = (jax.lax.dot_general(
        attn, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + bo_ref[:]).astype(x.dtype)
    out_ref[0] = x + proj


@functools.partial(jax.jit,
                   static_argnames=("scale", "heads", "eps", "interpret"))
def _subblock_pallas(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias,
                     scale: float, heads: int, eps: float,
                     interpret: bool = False):
    b, s, w = x.shape
    return pl.pallas_call(
        functools.partial(_subblock_kernel, scale=scale, heads=heads, w=w,
                          eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 3 * w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias)


def _subblock_ref(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias, scale, heads,
                  eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_.astype(jnp.float32)
         + be.astype(jnp.float32)).astype(x.dtype)
    qkv = jnp.einsum("bsw,wo->bso", y, w_qkv) + b_qkv
    o = _packed_ref(qkv, bias, scale, heads)
    return x + (jnp.einsum("bsw,wo->bso", o, w_out) + b_out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _subblock_diff(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias,
                   scale, heads, eps, interpret):
    return _subblock_pallas(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias,
                            scale, heads, eps, interpret)


def _subblock_diff_fwd(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias,
                       scale, heads, eps, interpret):
    out = _subblock_diff(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias,
                         scale, heads, eps, interpret)
    return out, (x, g_, be, w_qkv, b_qkv, w_out, b_out, bias)


def _subblock_diff_bwd(scale, heads, eps, interpret, res, grad):
    _, vjp = jax.vjp(
        lambda *a: _subblock_ref(*a, scale, heads, eps), *res)
    return vjp(grad)


_subblock_diff.defvjp(_subblock_diff_fwd, _subblock_diff_bwd)


def attention_subblock(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    heads: int,
    *,
    causal: bool = False,
    scale: float | None = None,
    eps: float = 1e-5,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """The transformer block's whole attention half in ONE kernel:
    x + out_proj(attention(qkv_proj(LN(x)))).

    Beyond `fused_qkv_self_attention` this also fuses the pre-LN and the
    out-projection + residual, so the only HBM traffic per program is
    x in / x out (the LN'd activations and the attention output never
    materialize). Measured v5e bf16 ViT-B-16 shapes: 2.00 ms vs 2.91 for
    the XLA sub-block. Same bf16-only dispatch policy and tiered
    fallback as the fused-QKV kernel; differentiable (XLA-ref backward,
    gradients for all seven tensors)."""
    b, s, w = x.shape
    dh = w // heads
    if scale is None:
        scale = dh ** -0.5
    bias = (
        jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, _NEG_INF).astype(jnp.float32)
        if causal else jnp.zeros((s, s), jnp.float32)
    )
    if force_pallas is None:
        pick = (use_pallas() and x.dtype == jnp.bfloat16 and dh == 64
                and w % 128 == 0 and b * heads >= 64)
    else:
        pick = force_pallas
    if not pick:
        # two-stage fallback: XLA LN/projections + packed attention
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = (xc * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
             + ln_bias.astype(jnp.float32)).astype(x.dtype)
        qkv = jnp.einsum("bsw,wo->bso", y, w_qkv) + b_qkv
        o = packed_qkv_self_attention(qkv, heads, causal=causal, scale=scale,
                                      interpret=interpret)
        return x + (jnp.einsum("bsw,wo->bso", o, w_out) + b_out).astype(x.dtype)
    return _subblock_diff(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                          bias, scale, heads, eps, interpret)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mha_pallas_diff(q, k, v, shared_bias, scale, g, interpret):
    """Differentiable wrapper: Pallas forward, XLA-ref backward.
    q,k,v: [B,H,S,Dh] UNPADDED — no host-visible pad/slice copies
    (explicit padding materialized 2× q/k/v and cost more than the
    kernel saved: trunk 55 ms padded vs 46 XLA, measured); Mosaic masks
    the ragged tile edges itself. shared_bias: [Sq,Sk] fp32 (zeros if no
    mask). The backward recomputes scores — attention here is a few
    percent of step FLOPs, and it keeps the kernel residual-free."""
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    out = _mha_pallas(
        q.reshape(b * h, sq, dh),
        k.reshape(b * h, sk, dh),
        v.reshape(b * h, sk, dh),
        shared_bias, scale, g=g, interpret=interpret,
    )
    return out.reshape(b, h, sq, dh)


def _mha_pallas_diff_fwd(q, k, v, shared_bias, scale, g, interpret):
    return _mha_pallas_diff(q, k, v, shared_bias, scale, g, interpret), \
        (q, k, v, shared_bias)


def _mha_pallas_diff_bwd(scale, g, interpret, res, grad):
    q, k, v, shared_bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _mha_ref(q_, k_, v_, b_[None, None], scale),
        q, k, v, shared_bias,
    )
    return vjp(grad)


_mha_pallas_diff.defvjp(_mha_pallas_diff_fwd, _mha_pallas_diff_bwd)


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

    esize = 2 if q.dtype == jnp.bfloat16 else 4
    dp = round_up(dh, 128)
    g = _pick_group(b * h, round_up(sq, 16), round_up(sk, 16), dp, esize)

    train_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if force_pallas is None:
        # Shape-aware dispatch, measured on v5e at the model's real call
        # form (operands produced by split/transpose): XLA wins at CLIP
        # shapes because this call forces materializing the lane-padded
        # [B,H,S,Dh] operands the fused XLA attention never builds
        # (trunk 48.8 ms kernel vs 45.9 XLA, r2 ledger). The kernel wins
        # when the S×S HBM round-trip dominates (long sequences) or Dh
        # already fills the lanes. Self-attention callers with dh=64
        # should use `packed_qkv_self_attention`, which sidesteps the
        # operand materialization and beats XLA at CLIP shapes.
        pick = use_pallas() and (sk >= 512 or dh % 128 == 0)
    else:
        pick = force_pallas
    if not pick or train_dropout:
        sb = None if shared_bias is None else shared_bias[None, None]
        return _mha_ref(q, k, v, sb, scale, dropout_rate, dropout_rng)
    if shared_bias is None:
        shared_bias = jnp.zeros((sq, sk), jnp.float32)
    return _mha_pallas_diff(q, k, v, shared_bias, scale, max(g, 1), interpret)
