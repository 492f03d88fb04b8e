"""Fused MLP sub-block — the transformer block's second half in ONE
Pallas program: x + c_proj(act(c_fc(LN₂(x)))).

The symmetric twin of `ops.attention.attention_subblock` (which covers
the block's attention half). Serves the open_clip-style pre-LN blocks of
both CLIP towers (reference blocks built by
`open_clip.create_model_and_transforms` at
`/root/reference/run/train/train_fiq.py:49`; our
`models/clip/transformer.py`), where the MLP is 2/3 of the block FLOPs
(two W×4W matmuls vs the attention half's W×3W + W×W + scores).

Why fuse (r2 roofline, BASELINE.md): the trunk ran 126 TF/s against a
197 TF/s pure-GEMM chain at identical shapes — the residual is HBM
traffic between the XLA MLP ops. Per layer at ViT-B-16 B=128 bf16 the
unfused path round-trips the LN output [B,S,W] (19 MB), the hidden
[B,S,4W] twice (155 MB if the GELU doesn't fuse into either matmul),
and the projection output (19 MB). In-kernel, only x in / x out touch
HBM and both weight matrices stay VMEM-resident across the grid
(768×3072 bf16 ×2 ≈ 9.4 MB at W=768, inside the budget).

The hidden dimension is processed in column chunks: acc += act(y @
W_fc[:, c]) @ W_proj[c, :], so the fp32 hidden transient is [S, C]
rather than [S, 4W] and the kernel headroom scales to any S. Activation
runs in fp32 off the first matmul's accumulator.

Same tiered dispatch policy as the attention sub-block: bf16-only on
TPU (the in-kernel matmul deviates ~2e-4 from XLA's HIGHEST fp32 path,
which fp32 parity runs must not absorb); identical XLA formula
otherwise. Differentiable via custom VJP (XLA-ref backward, gradients
for all seven tensors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionern_aaai2024_tpu.ops.common import use_pallas

# fp32 hidden-transient budget per program: chunk the 4W axis so
# [S, chunk] stays small; 1536 keeps ViT-B (S=197) under 1.2 MB while
# chunks stay MXU-wide.
_MAX_CHUNK = 1536


def _act_f32(h: jnp.ndarray, name: str) -> jnp.ndarray:
    if name == "quick_gelu":
        return h * jax.nn.sigmoid(1.702 * h)
    if name == "gelu":
        return jax.nn.gelu(h, approximate=False)
    raise ValueError(f"unknown activation {name!r}")


def _pick_splits(f: int) -> int:
    """Smallest split count whose chunk is ≤ _MAX_CHUNK, divides f, and
    keeps chunks lane-aligned."""
    for splits in range(1, f // 128 + 1):
        if f % splits:
            continue
        chunk = f // splits
        if chunk <= _MAX_CHUNK and chunk % 128 == 0:
            return splits
    return 1


def _pick_gb(b: int, s: int, w: int, f: int) -> int:
    """Images per program: largest divisor of b whose VMEM working set
    (resident weights + double-buffered x/out blocks + fp32 hidden
    chunk and accumulator) stays inside ~14 MB."""
    weights = 2 * w * f * 2                 # both matrices, bf16
    chunk = f // _pick_splits(f)
    for gb in (8, 4, 2, 1):
        if b % gb:
            continue
        rows = gb * s
        working = (weights + 4 * rows * w * 2          # x in/out, ×2 buffers
                   + rows * chunk * 4 + 2 * rows * w * 4)  # hidden + y/acc
        if working <= 14 * 1024 * 1024:
            return gb
    return 1


def _mlp_kernel(x_ref, g_ref, be_ref, wfc_ref, bfc_ref, wp_ref, bp_ref,
                out_ref, *, activation: str, eps: float, splits: int,
                gb: int):
    # gb images per program, flattened to one [gb·S, W] row block: the
    # per-program GEMMs get taller (better MXU utilization at large B)
    # while the weights stay VMEM-resident.
    x = x_ref[:].reshape(gb * x_ref.shape[1], x_ref.shape[2])  # [gb·S, W]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
         + be_ref[:].astype(jnp.float32)).astype(x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    f = wfc_ref.shape[1]
    c = f // splits
    acc = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    for i in range(splits):
        h = jax.lax.dot_general(
            y, wfc_ref[:, c * i: c * (i + 1)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + bfc_ref[c * i: c * (i + 1)].astype(jnp.float32)
        h = _act_f32(h, activation).astype(x.dtype)
        acc = acc + jax.lax.dot_general(
            h, wp_ref[c * i: c * (i + 1), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    out = x + (acc + bp_ref[:].astype(jnp.float32)).astype(x.dtype)
    out_ref[:] = out.reshape(out_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("activation", "eps", "splits", "gb",
                                    "interpret"))
def _mlp_pallas(x, g_, be, w_fc, b_fc, w_proj, b_proj,
                activation: str, eps: float, splits: int, gb: int = 1,
                interpret: bool = False):
    b, s, w = x.shape
    f = w_fc.shape[1]
    return pl.pallas_call(
        functools.partial(_mlp_kernel, activation=activation, eps=eps,
                          splits=splits, gb=gb),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, s, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            # constant index maps: both weight matrices are fetched once
            # and stay VMEM-resident across the whole grid
            pl.BlockSpec((w, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, s, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g_, be, w_fc, b_fc, w_proj, b_proj)


def _mlp_ref(x, g_, be, w_fc, b_fc, w_proj, b_proj, activation, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * g_.astype(jnp.float32)
         + be.astype(jnp.float32)).astype(x.dtype)
    h = (jnp.einsum("bsw,wf->bsf", y, w_fc).astype(jnp.float32)
         + b_fc.astype(jnp.float32))
    h = _act_f32(h, activation).astype(x.dtype)
    o = jnp.einsum("bsf,fw->bsw", h, w_proj).astype(jnp.float32) \
        + b_proj.astype(jnp.float32)
    return x + o.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _mlp_diff(x, g_, be, w_fc, b_fc, w_proj, b_proj,
              activation, eps, splits, gb, interpret):
    return _mlp_pallas(x, g_, be, w_fc, b_fc, w_proj, b_proj,
                       activation, eps, splits, gb, interpret)


def _mlp_diff_fwd(x, g_, be, w_fc, b_fc, w_proj, b_proj,
                  activation, eps, splits, gb, interpret):
    out = _mlp_diff(x, g_, be, w_fc, b_fc, w_proj, b_proj,
                    activation, eps, splits, gb, interpret)
    return out, (x, g_, be, w_fc, b_fc, w_proj, b_proj)


def _mlp_diff_bwd(activation, eps, splits, gb, interpret, res, grad):
    _, vjp = jax.vjp(lambda *a: _mlp_ref(*a, activation, eps), *res)
    return vjp(grad)


_mlp_diff.defvjp(_mlp_diff_fwd, _mlp_diff_bwd)


def mlp_subblock(
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
    """The transformer block's whole MLP half in ONE kernel:
    x + c_proj(act(c_fc(LN(x)))).

    x: [B, S, W]; w_fc: [W, F]; w_proj: [F, W] (nn.Dense layout, the
    checkpoint converter sees no difference). Only x in / x out touch
    HBM per program; both weight matrices stay VMEM-resident across the
    grid; activation is computed in fp32 off the first matmul's
    accumulator. bf16-only dispatch with the identical-formula XLA
    fallback everywhere else; differentiable (XLA-ref backward)."""
    b, s, w = x.shape
    f = w_fc.shape[1]
    if force_pallas is None:
        # Mosaic has no erf/erfc lowering, so exact GELU cannot run
        # inside the kernel on real TPUs (measured crash: eval
        # --quantize-towers with a scratch-init exact-GELU config).
        # quick_gelu is the production activation (OpenAI checkpoints);
        # exact-GELU configs take the XLA path.
        pick = (use_pallas() and x.dtype == jnp.bfloat16
                and w % 128 == 0 and f % 128 == 0 and b >= 8
                and activation == "quick_gelu")
    else:
        pick = force_pallas
    if not pick:
        return _mlp_ref(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                        activation, eps)
    return _mlp_diff(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                     activation, eps, _pick_splits(f), _pick_gb(b, s, w, f),
                     interpret)
