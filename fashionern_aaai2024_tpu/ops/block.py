"""Whole-transformer-block kernel — BOTH halves of a pre-LN block in
ONE Pallas program:

    y = x + out_proj(attn(qkv_proj(LN₁(x))))
    z = y + c_proj(act(c_fc(LN₂(y))))

The next rung of the r2/r3 fusion ladder (attention sub-block → MLP
sub-block → whole block): per program only x in / z out touch HBM — the
post-attention residual `y` never materializes either. All FOUR weight
matrices stay VMEM-resident across the grid, which bounds the dispatch
to narrow towers: at W=512 (the CLIP text transformer,
`models/clip/text.py`; reference text tower built at
`/root/reference/run/train/train_fiq.py:49`) they total
512·(1536+512+2048·2) · 2B ≈ 6.3 MB — comfortably inside the budget.
At W=768 (ViT-B-16 trunk) they total 14.1 MB and do NOT fit next to the
working set, so the ViT trunk keeps its two sub-block kernels.

Same bf16-only dispatch policy as the sub-block kernels (in-kernel
matmuls deviate ~2e-4 from XLA's HIGHEST fp32); identical XLA formula
as fallback; custom VJP (XLA-ref backward, gradients for all eleven
tensors)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionern_aaai2024_tpu.ops.mlp import _act_f32

_NEG_INF = -1e30
# resident-weight budget for the whole-block tier (bf16 bytes)
_WEIGHT_BUDGET = 8 * 1024 * 1024


def _ln_f32(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _block_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  g2_ref, b2_ref, wfc_ref, bfc_ref, wp_ref, bp_ref, bias_ref,
                  out_ref, *, scale: float, heads: int, w: int, eps: float,
                  activation: str, gb: int):
    dh = w // heads
    for i in range(gb):
        x = x_ref[i]                                    # [S, W] raw
        y_ln = _ln_f32(x, g1_ref[:], b1_ref[:], eps)
        qkv = (jax.lax.dot_general(
            y_ln, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[:]).astype(x.dtype)
        heads_out = []
        for h in range(heads):
            q = qkv[:, dh * h: dh * (h + 1)]
            k = qkv[:, w + dh * h: w + dh * (h + 1)]
            v = qkv[:, 2 * w + dh * h: 2 * w + dh * (h + 1)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias_ref[:]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            heads_out.append(jax.lax.dot_general(
                (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype))
        attn = jnp.concatenate(heads_out, axis=-1)
        y = x + (jax.lax.dot_general(
            attn, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:]).astype(x.dtype)
        # MLP half, hidden in one chunk (narrow towers: [S, 4W] fp32 is
        # small at S=77/W=512)
        z_ln = _ln_f32(y, g2_ref[:], b2_ref[:], eps)
        h_ = jax.lax.dot_general(
            z_ln, wfc_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[:].astype(jnp.float32)
        h_ = _act_f32(h_, activation).astype(x.dtype)
        o = jax.lax.dot_general(
            h_, wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[:].astype(jnp.float32)
        out_ref[i] = y + o.astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "eps", "activation", "gb", "interpret"))
def _block_pallas(x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc, wp, bp,
                  bias, scale: float, heads: int, eps: float, activation: str,
                  gb: int, interpret: bool = False):
    b, s, w = x.shape
    f = wfc.shape[1]
    row = pl.BlockSpec((gb, s, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_kernel, scale=scale, heads=heads, w=w,
                          eps=eps, activation=activation, gb=gb),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        grid=(b // gb,),
        in_specs=[
            row,
            const((w,)), const((w,)),
            const((w, 3 * w)), const((3 * w,)),
            const((w, w)), const((w,)),
            const((w,)), const((w,)),
            const((w, f)), const((f,)),
            const((f, w)), const((w,)),
            const((s, s)),
        ],
        out_specs=row,
        interpret=interpret,
    )(x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc, wp, bp, bias)


def _block_ref(x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc, wp, bp,
               bias, scale, heads, eps, activation):
    from fashionern_aaai2024_tpu.ops.attention import _subblock_ref
    from fashionern_aaai2024_tpu.ops.mlp import _mlp_ref

    y = _subblock_ref(x, g1, b1, wqkv, bqkv, wo, bo, bias, scale, heads, eps)
    return _mlp_ref(y, g2, b2, wfc, bfc, wp, bp, activation, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18, 19))
def _block_diff(x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc, wp, bp,
                bias, scale, heads, eps, activation, gb, interpret):
    return _block_pallas(x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc,
                         wp, bp, bias, scale, heads, eps, activation, gb,
                         interpret)


def _block_diff_fwd(x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc, wp, bp,
                    bias, scale, heads, eps, activation, gb, interpret):
    out = _block_diff(x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc, wp,
                      bp, bias, scale, heads, eps, activation, gb, interpret)
    return out, (x, g1, b1, wqkv, bqkv, wo, bo, g2, b2, wfc, bfc, wp, bp,
                 bias)


def _block_diff_bwd(scale, heads, eps, activation, gb, interpret, res, grad):
    _, vjp = jax.vjp(
        lambda *a: _block_ref(*a, scale, heads, eps, activation), *res)
    return vjp(grad)


_block_diff.defvjp(_block_diff_fwd, _block_diff_bwd)


def transformer_block(
    x: jnp.ndarray,
    ln1_scale: jnp.ndarray,
    ln1_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    ln2_scale: jnp.ndarray,
    ln2_bias: jnp.ndarray,
    w_fc: jnp.ndarray,
    b_fc: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    heads: int,
    *,
    causal: bool = False,
    activation: str = "quick_gelu",
    scale: float | None = None,
    eps: float = 1e-5,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One pre-LN transformer block in ONE kernel (see module docstring).

    Returns None-equivalent fallback computation when the dispatch gate
    declines (fp32, wide towers, off-TPU) — callers can use it
    unconditionally in place of the sub-block pair."""
    b, s, w = x.shape
    f = w_fc.shape[1]
    dh = w // heads
    if scale is None:
        scale = dh ** -0.5
    if force_pallas is None:
        # Measured, final position (r3 ledger, v5e, text-tower shapes
        # [B,77,512] causal bf16): the whole-block kernel TIES the
        # attention+MLP sub-block pair — 1.77 vs 1.78 ms/layer at
        # B=128, 2.28 vs 2.24 at B=256, 3.38 vs 3.41 at B=512. The
        # post-attention residual it eliminates is ~20 MB/layer of HBM
        # traffic ≈ 1% of layer time at these shapes, inside noise. The
        # sub-block pair stays the production dispatch (simpler, each
        # half independently proven); the whole-block kernel remains
        # for force_pallas benchmarking and as the template if a
        # narrow-tower model with a bandwidth-starved profile appears.
        pick = False
    else:
        pick = force_pallas
    if pick:  # resident-weight budget only matters on the kernel path
        weight_bytes = (w * 3 * w + w * w + 2 * w * f) * 2
        if weight_bytes > _WEIGHT_BUDGET:
            pick = False
    if not pick:
        from fashionern_aaai2024_tpu.ops.attention import attention_subblock
        from fashionern_aaai2024_tpu.ops.mlp import mlp_subblock

        y = attention_subblock(x, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out,
                               b_out, heads, causal=causal, scale=scale,
                               eps=eps, interpret=interpret)
        return mlp_subblock(y, ln2_scale, ln2_bias, w_fc, b_fc, w_proj,
                            b_proj, activation=activation, eps=eps,
                            interpret=interpret)
    bias = (
        jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, _NEG_INF)
        .astype(jnp.float32)
        if causal else jnp.zeros((s, s), jnp.float32)
    )
    gb = 4 if b % 4 == 0 and s <= 128 else (2 if b % 2 == 0 else 1)
    return _block_diff(x, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out, b_out,
                       ln2_scale, ln2_bias, w_fc, b_fc, w_proj, b_proj,
                       bias, scale, heads, eps, activation, gb, interpret)
