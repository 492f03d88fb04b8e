"""int8 MLP sub-block kernel — the `--quantize-towers` serving option
composed with sub-block fusion.

r2's int8 option (`ops/qmatmul.py`) ran the two MLP matmuls int8 via
XLA (+8% measured) but as separate ops: the LN output, the quantized
activations, the int32/fp32 hidden tensor and the activation output all
round-trip HBM. r3's bf16 MLP-sub-block kernel (`ops/mlp.py`) showed
those round-trips are the gap between 126 and ~148 TF/s. This kernel
does BOTH: one program per row-block computes

    LN → per-row int8 quantize → int8×int8 MXU dot (2× bf16 rate on
    v5e) → fp32 rescale + bias → activation → re-quantize → second
    int8 dot → rescale → residual

with both WEIGHT matrices resident in VMEM as int8 (4.7 MB at W=768 —
half the bf16 kernel's 9.4 MB, doubling the row-block headroom).
Weights are quantized per-output-channel OUTSIDE the kernel (XLA hoists
the loop-invariant quantization, zero checkpoint surgery — same
contract as `ops/qmatmul.py`).

Serving-only (no VJP — `--quantize-towers` is an inference flag).
Fallback: the identical-semantics XLA formula (LN + two
`int8_matmul`s), used off-TPU and at undispatchable shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionern_aaai2024_tpu.ops.common import use_pallas
from fashionern_aaai2024_tpu.ops.mlp import _act_f32
from fashionern_aaai2024_tpu.ops.qmatmul import int8_matmul, quantize_colwise

_EPS = 1e-8


def _quant_rows_f32(xf):
    """fp32 [R, K] → (int8 values, [R, 1] fp32 scales)."""
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                        _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qmlp_kernel(x_ref, g_ref, be_ref, wfcq_ref, wfcs_ref, bfc_ref,
                 wpq_ref, wps_ref, bp_ref, out_ref, *, activation: str,
                 eps: float, splits: int, gb: int):
    x = x_ref[:].reshape(gb * x_ref.shape[1], x_ref.shape[2])   # [R, W]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
         + be_ref[:].astype(jnp.float32))                        # fp32
    yq, ys = _quant_rows_f32(y)
    f = wfcq_ref.shape[1]
    c = f // splits
    acc = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    for i in range(splits):
        h32 = jax.lax.dot_general(
            yq, wfcq_ref[:, c * i: c * (i + 1)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        h = (h32 * ys * wfcs_ref[c * i: c * (i + 1)]
             + bfc_ref[c * i: c * (i + 1)].astype(jnp.float32))
        h = _act_f32(h, activation)
        hq, hs = _quant_rows_f32(h)
        o32 = jax.lax.dot_general(
            hq, wpq_ref[c * i: c * (i + 1), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        acc = acc + o32 * hs * wps_ref[:]
    out = x + (acc + bp_ref[:].astype(jnp.float32)).astype(x.dtype)
    out_ref[:] = out.reshape(out_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("activation", "eps", "splits", "gb",
                                    "interpret"))
def _qmlp_pallas(x, g_, be, wfc_q, wfc_s, b_fc, wp_q, wp_s, bp,
                 activation: str, eps: float, splits: int, gb: int = 1,
                 interpret: bool = False):
    b, s, w = x.shape
    f = wfc_q.shape[1]
    return pl.pallas_call(
        functools.partial(_qmlp_kernel, activation=activation, eps=eps,
                          splits=splits, gb=gb),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, s, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            # int8 weights + their per-channel scales stay VMEM-resident
            pl.BlockSpec((w, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g_, be, wfc_q, wfc_s, b_fc, wp_q, wp_s, bp)


def _qmlp_ref(x, g_, be, w_fc, b_fc, w_proj, b_proj, activation, eps):
    """Identical-semantics XLA formula (LN fp32 → int8 matmul → act →
    int8 matmul → residual)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_.astype(jnp.float32)
         + be.astype(jnp.float32))
    h = int8_matmul(y, w_fc, b_fc, out_dtype=jnp.float32)
    h = _act_f32(h, activation)
    o = int8_matmul(h, w_proj, b_proj, out_dtype=jnp.float32)
    return x + o.astype(x.dtype)


def int8_mlp_subblock(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_fc: jnp.ndarray,
    b_fc: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    *,
    activation: str = "quick_gelu",
    eps: float = 1e-5,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """The MLP half of a block, int8, in ONE kernel (module docstring).
    Weight layout matches nn.Dense ([W, F] / [F, W]); weights arrive in
    float and are quantized in-graph (hoisted by XLA)."""
    b, s, w = x.shape
    f = w_fc.shape[1]
    if force_pallas is None:
        # exact GELU needs erf, which Mosaic does not lower (see
        # mlp_subblock) — exact-GELU configs take the int8-XLA path
        pick = (use_pallas() and w % 128 == 0 and f % 128 == 0 and b >= 8
                and x.dtype in (jnp.bfloat16, jnp.float32)
                and activation == "quick_gelu")
    else:
        pick = force_pallas
    if not pick:
        return _qmlp_ref(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                         activation, eps)
    from fashionern_aaai2024_tpu.ops.mlp import _pick_gb, _pick_splits

    wfc_q, wfc_s = quantize_colwise(w_fc)
    wp_q, wp_s = quantize_colwise(w_proj)
    return _qmlp_pallas(x, ln_scale, ln_bias, wfc_q, wfc_s[0], b_fc,
                        wp_q, wp_s[0], b_proj, activation, eps,
                        _pick_splits(f), _pick_gb(b, s, w, f), interpret)


def _qattn_kernel(x_ref, g_ref, be_ref, wqkvq_ref, wqkvs_ref, bqkv_ref,
                  woq_ref, wos_ref, bo_ref, bias_ref, out_ref, *,
                  scale: float, heads: int, w: int, eps: float):
    x = x_ref[0]                                        # [S, W] raw
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
         + be_ref[:].astype(jnp.float32))               # fp32
    yq, ys = _quant_rows_f32(y)
    qkv32 = jax.lax.dot_general(
        yq, wqkvq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    qkv = (qkv32 * ys * wqkvs_ref[:]
           + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
    dh = w // heads
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
        ))
    attn = jnp.concatenate(heads_out, axis=-1)          # fp32
    aq, as_ = _quant_rows_f32(attn)
    o32 = jax.lax.dot_general(
        aq, woq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    proj = o32 * as_ * wos_ref[:] + bo_ref[:].astype(jnp.float32)
    out_ref[0] = x + proj.astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "heads", "eps", "interpret"))
def _qattn_pallas(x, g_, be, wqkv_q, wqkv_s, b_qkv, wo_q, wo_s, b_o, bias,
                  scale: float, heads: int, eps: float,
                  interpret: bool = False):
    b, s, w = x.shape
    return pl.pallas_call(
        functools.partial(_qattn_kernel, scale=scale, heads=heads, w=w,
                          eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 3 * w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g_, be, wqkv_q, wqkv_s, b_qkv, wo_q, wo_s, b_o, bias)


def _qattn_ref(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias, scale, heads,
               eps):
    """Identical-semantics XLA formula: LN fp32 → int8 qkv projection →
    bf16/fp32 attention → int8 out projection → residual."""
    from fashionern_aaai2024_tpu.ops.attention import _packed_ref

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_.astype(jnp.float32)
         + be.astype(jnp.float32))
    qkv = int8_matmul(y, w_qkv, b_qkv, out_dtype=x.dtype)
    o = _packed_ref(qkv, bias, scale, heads).astype(jnp.float32)
    proj = int8_matmul(o, w_out, b_out, out_dtype=jnp.float32)
    return x + proj.astype(x.dtype)


_NEG_INF = -1e30


def int8_attention_subblock(
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
    """The attention half of a block with int8 PROJECTIONS (qkv + out)
    in one kernel — attention math itself stays bf16/fp32 (scores from
    quantized q/k would compound error). Serving-only companion of
    `int8_mlp_subblock` for `--quantize-towers`."""
    b, s, w = x.shape
    dh = w // heads
    if scale is None:
        scale = dh ** -0.5
    bias = (
        jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, _NEG_INF)
        .astype(jnp.float32)
        if causal else jnp.zeros((s, s), jnp.float32)
    )
    if force_pallas is None:
        pick = (use_pallas() and dh == 64 and w % 128 == 0 and b >= 8
                and x.dtype in (jnp.bfloat16, jnp.float32))
    else:
        pick = force_pallas
    if not pick:
        return _qattn_ref(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                          bias, scale, heads, eps)
    wqkv_q, wqkv_s = quantize_colwise(w_qkv)
    wo_q, wo_s = quantize_colwise(w_out)
    return _qattn_pallas(x, ln_scale, ln_bias, wqkv_q, wqkv_s[0], b_qkv,
                        wo_q, wo_s[0], b_out, bias, scale, heads, eps,
                        interpret)
