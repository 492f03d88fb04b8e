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
        pick = (use_pallas() and w % 128 == 0 and f % 128 == 0 and b >= 8
                and x.dtype in (jnp.bfloat16, jnp.float32))
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
