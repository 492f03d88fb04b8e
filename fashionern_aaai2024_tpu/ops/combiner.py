"""Fused σ-gated combiner (eval-time CombinerSimple forward).

The combiner (`models/fusion_model.py:58-94`; our
`models/ern/fusion.py:CombinerSimple`) is two projection matmuls, a
gate MLP, a sigmoid blend and an L2-norm. This kernel runs the whole
thing in one `pallas_call` — both projections, the hidden matmul, the
[B,1] gate, the blend and the normalization stay in VMEM for a row
tile; nothing but inputs/outputs touches HBM.

Dispatch honesty (same policy as attention/layernorm): at this model's
shapes (d=640, B≤1024) XLA fuses the chain within ~10% of this kernel,
so the flax module stays on the XLA path by default; the kernel is the
library's fused-combiner reference (`combiner_apply(force_pallas=True)`
to use or benchmark it) and is parity-tested against the module.

Train-time dropout stays on the XLA path (dropout between matmuls is
not worth a custom backward at these sizes — same call as the
attention kernel's dropout policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashionern_aaai2024_tpu.ops.common import round_up, use_pallas

_ROW_TILE = 128


def _combiner_kernel(img_ref, txt_ref, wt_ref, bt_ref, wi_ref, bi_ref,
                     wh_ref, bh_ref, wo_ref, bo_ref, out_ref):
    img = img_ref[:]                                   # [T, d]
    txt = txt_ref[:]
    tp = jnp.maximum(
        jax.lax.dot_general(txt, wt_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bt_ref[:], 0.0)
    ip = jnp.maximum(
        jax.lax.dot_general(img, wi_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bi_ref[:], 0.0)
    cat = jnp.concatenate([tp, ip], axis=-1)           # [T, 8d]
    h = jnp.maximum(
        jax.lax.dot_general(cat.astype(img.dtype), wh_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bh_ref[:], 0.0)
    # gate: wo is [hidden, 1] padded to [hidden, 128]; column 0 is live
    logits = jax.lax.dot_general(
        h.astype(img.dtype), wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[:]
    sigma = jax.nn.sigmoid(logits[:, :1])              # [T, 1]
    imgf = img.astype(jnp.float32)
    txtf = txt.astype(jnp.float32)
    out = sigma * txtf + (1.0 - sigma) * imgf
    norm = jnp.maximum(jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True)), 1e-12)
    out_ref[:] = (out / norm).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _combiner_pallas(image_features, text_features, params, interpret=False):
    b, d = image_features.shape
    p = params
    wt, bt = p["text_projection"]["kernel"], p["text_projection"]["bias"]
    wi, bi = p["image_projection"]["kernel"], p["image_projection"]["bias"]
    wh, bh = p["scalar_hidden"]["kernel"], p["scalar_hidden"]["bias"]
    wo, bo = p["scalar_out"]["kernel"], p["scalar_out"]["bias"]
    bp = round_up(b, 8)
    tile = min(_ROW_TILE, bp)
    bp = round_up(bp, tile)
    imgp = jnp.pad(image_features, ((0, bp - b), (0, 0)))
    txtp = jnp.pad(text_features, ((0, bp - b), (0, 0)))
    # pad the [hidden, 1] gate projection to lane width
    wo_p = jnp.pad(wo, ((0, 0), (0, 128 - wo.shape[1])))
    bo_p = jnp.pad(bo, ((0, 128 - bo.shape[0]),))

    dims = dict(pd=wt.shape[1], hd=wh.shape[1])
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _combiner_kernel,
        out_shape=jax.ShapeDtypeStruct((bp, d), image_features.dtype),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(d, dims["pd"]), full(dims["pd"]),
            full(d, dims["pd"]), full(dims["pd"]),
            full(2 * dims["pd"], dims["hd"]), full(dims["hd"]),
            full(dims["hd"], 128), full(128),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(imgp, txtp, wt, bt, wi, bi, wh, bh, wo_p, bo_p)
    return out[:b]


def combiner_apply(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    params: dict,
    *,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Eval-time CombinerSimple forward from a params subtree
    (`variables["params"]["ern"]["Combiner_module"]` or any CombinerSimple
    instance's params)."""
    # VMEM capacity: the single-block kernel keeps all weights resident;
    # the gate MLP's [8d, 8d] matrix alone is 64·d² floats (105 MB at
    # d=640 vs ~16 MB VMEM), so the fused form only exists for small
    # dims — production dims always take the XLA path (which measures
    # within noise of fused anyway; see module docstring).
    d = image_features.shape[-1]
    weight_bytes = (2 * (d * 4 * d) + (8 * d) * (8 * d) + 8 * d * 128) * 4
    fits = weight_bytes < 8 * 1024 * 1024
    pick = (use_pallas() and fits) if force_pallas is None else force_pallas
    if pick and not fits and not interpret:
        raise ValueError(
            f"fused combiner needs {weight_bytes/2**20:.0f} MB of weights in "
            f"VMEM (d={d}); use the XLA path (force_pallas=False) at this size"
        )
    if pick:
        return _combiner_pallas(image_features, text_features, params,
                                interpret=interpret)
    # XLA path: identical math
    def proj(x, name):
        w = params[name]["kernel"]
        return jnp.maximum(x @ w + params[name]["bias"], 0.0)

    cat = jnp.concatenate(
        [proj(text_features, "text_projection"), proj(image_features, "image_projection")],
        axis=-1,
    )
    h = jnp.maximum(cat @ params["scalar_hidden"]["kernel"]
                    + params["scalar_hidden"]["bias"], 0.0)
    sigma = jax.nn.sigmoid(h @ params["scalar_out"]["kernel"]
                           + params["scalar_out"]["bias"])
    out = sigma * text_features + (1.0 - sigma) * image_features
    n = jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    return out / n
