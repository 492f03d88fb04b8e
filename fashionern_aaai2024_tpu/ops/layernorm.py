"""Fused LayerNorm.

Used by every transformer block in the stack: CLIP ViT/text blocks
(torch `nn.LayerNorm`, eps 1e-5) and the BERT-semantics fusion encoder
(HF BertModel LayerNorm, eps 1e-12) — see reference
`models/fusion_model.py:157-177` (BertModel) and the open_clip towers it
instantiates at `run/train/train_fiq.py:49`.

One row-tiled Pallas kernel: mean/var reduction + normalize + affine in
VMEM, fp32 statistics regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionern_aaai2024_tpu.ops.common import round_up

_ROW_TILE = 256


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = xc * inv * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def _layer_norm_ref(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _layer_norm_pallas(x, scale, bias, eps: float, interpret: bool = False):
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    rows_p = round_up(max(rows, 8), _ROW_TILE) if rows > _ROW_TILE else round_up(rows, 8)
    if rows_p != rows:
        x2 = jnp.pad(x2, ((0, rows_p - rows), (0, 0)))
    tile = min(_ROW_TILE, rows_p)
    grid = (rows_p // tile,)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows_p, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias)
    return out[:rows].reshape(orig_shape)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    *,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis with fp32 statistics.

    Dispatch (measured on v5e, ViT-B trunk): the XLA path is the
    production default — XLA fuses the LN into neighbouring matmul
    epilogues, while a custom kernel is an opaque call that breaks that
    fusion (trunk throughput dropped 73 vs 90 TF/s with the kernel in
    the loop). The Pallas kernel is kept for `force_pallas=True`
    benchmarking and as the template for genuinely fusion-hostile
    shapes."""
    pallas_ok = x.shape[-1] % 128 == 0
    pick = False if force_pallas is None else force_pallas
    if pick and pallas_ok:
        return _layer_norm_pallas(x, scale, bias, eps, interpret=interpret)
    return _layer_norm_ref(x, scale, bias, eps)
