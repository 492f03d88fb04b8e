"""Dynamic int8 matmul for serving (`--quantize-towers`).

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (394 vs 197 TOPS).
For gallery embedding (inference only, frozen weights) the transformer
MLP matmuls — 8 of 12 S·W² GEMM units per layer — can run int8 with
dynamic symmetric quantization:

  * activations: per-row max-abs scale (rows are tokens; LN'd
    activations are well-conditioned for symmetric quant);
  * weights: per-output-channel max-abs scale, computed inline in the
    graph (zero checkpoint surgery — the variables tree is unchanged;
    XLA hoists the weight quantization out of the per-batch loop when
    weights are loop-invariant).

Accuracy contract is measured, not assumed: rank-agreement tests pin
top-k overlap vs the bf16 path, and the gallery int8 option
(`ops/quant.py`) already established the serving-quantization pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_rowwise(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K] float → (int8 values, [..., 1] fp32 scales)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_colwise(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float → (int8 values, [1, N] fp32 scales) per out-channel."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), _EPS) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                bias: jnp.ndarray | None = None,
                out_dtype=None) -> jnp.ndarray:
    """x: [..., K] float; w: [K, N] float → [..., N].

    Both operands dynamically quantized; the int8×int8 product
    accumulates int32 on the MXU and is rescaled in fp32."""
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_rowwise(x)
    wq, ws = quantize_colwise(w)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = acc * xs * ws
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
