"""Multi-(b,h)-per-program fused attention experiment (VERDICT r1 #4).

At CLIP ViT shapes (B=128, H=12, S=197, Dh=64) XLA's attention is
HBM-bound: the [BH, S, S] score tensor round-trips to HBM around the
softmax (~1.9 ms/layer measured). Round-1's Pallas kernel fused that
but ran one (b,h) per program (grid=1536) and drowned in launch
overhead (3.4 ms/layer). This experiment processes G (b,h) pairs per
program — scores never leave VMEM, overhead amortized over G.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/attn_experiment.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, S, DH = 128, 12, 197, 64
SP = 208   # S padded to bf16 sublane tile (16)
SKP = 256  # key-side padded to lanes
DP = 128   # Dh padded to lanes


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, g):
    for i in range(g):  # static unroll: G pairs back-to-back, MXU pipelined
        q = q_ref[0, i]                      # [SP, DP]
        k = k_ref[0, i]                      # [SKP, DP]
        v = v_ref[0, i]
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
        out_ref[0, i] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "g"))
def mha_grouped(q, k, v, bias, scale: float, g: int):
    """q:[BH,SP,DP] k,v:[BH,SKP,DP] bias:[SP,SKP]."""
    bh = q.shape[0]
    assert bh % g == 0
    qg = q.reshape(bh // g, g, SP, DP)
    kg = k.reshape(bh // g, g, SKP, DP)
    vg = v.reshape(bh // g, g, SKP, DP)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, g=g),
        out_shape=jax.ShapeDtypeStruct((bh // g, g, SP, DP), q.dtype),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((1, g, SP, DP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, SKP, DP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, SKP, DP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SP, SKP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, SP, DP), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qg, kg, vg, bias).reshape(bh, SP, DP)


def xla_ref(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k) * jnp.asarray(scale, q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def sync(x):
    return np.asarray(x[:1, :1, :1])


def timeit(fn, *args, iters=30):
    sync(fn(*args)); sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    g = np.random.default_rng(0)
    scale = DH ** -0.5
    bh = B * H
    q = g.standard_normal((bh, S, DH)).astype(np.float32)
    k = g.standard_normal((bh, S, DH)).astype(np.float32)
    v = g.standard_normal((bh, S, DH)).astype(np.float32)

    # numerics check (fp32, small slice, on-device)
    qp = jnp.zeros((bh, SP, DP), jnp.float32).at[:, :S, :DH].set(q)
    kp = jnp.zeros((bh, SKP, DP), jnp.float32).at[:, :S, :DH].set(k)
    vp = jnp.zeros((bh, SKP, DP), jnp.float32).at[:, :S, :DH].set(v)
    bias = jnp.full((SP, SKP), -1e30, jnp.float32).at[:, :S].set(0.0)
    want = np.asarray(xla_ref(jnp.asarray(q[:24]), jnp.asarray(k[:24]),
                              jnp.asarray(v[:24]), scale))
    got = np.asarray(mha_grouped(qp[:24], kp[:24], vp[:24], bias, scale, 8)
                     )[:, :S, :DH]
    err = np.abs(got - want).max()
    print(f"fp32 max err vs XLA (G=8): {err:.2e}", flush=True)
    assert err < 2e-5

    # bf16 timing
    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    t = timeit(jax.jit(functools.partial(xla_ref, scale=scale)), qb, kb, vb)
    print(f"XLA attention (bf16): {t*1e3:.3f} ms/layer", flush=True)

    qpb = qp.astype(jnp.bfloat16)
    kpb = kp.astype(jnp.bfloat16)
    vpb = vp.astype(jnp.bfloat16)
    for G in (1, 4, 8, 16, 32, 64):
        if bh % G:
            continue
        t = timeit(lambda a, b, c: mha_grouped(a, b, c, bias, scale, G),
                   qpb, kpb, vpb)
        print(f"grouped pallas G={G:3d}: {t*1e3:.3f} ms/layer", flush=True)




# ---------------------------------------------------------------------------
# Packed-lanes kernel: consumes the QKV projection output [B, S, 3W]
# directly — no head-split transpose pass, no Dh 64->128 HBM padding
# (heads live packed in lanes; slicing happens in VMEM).

W = H * DH  # 768


def _packed_kernel(qkv_ref, bias_ref, out_ref, *, scale, gb):
    for i in range(gb):
        for h in range(H):
            q = qkv_ref[i, :, 64 * h: 64 * (h + 1)]                  # [SP, 64]
            k = qkv_ref[i, :, W + 64 * h: W + 64 * (h + 1)]
            v = qkv_ref[i, :, 2 * W + 64 * h: 2 * W + 64 * (h + 1)]
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
            out_ref[i, :, 64 * h: 64 * (h + 1)] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "gb"))
def mha_packed(qkv, bias, scale: float, gb: int):
    """qkv: [B, SP, 3W] (projection output, sublane-padded only)."""
    b = qkv.shape[0]
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, gb=gb),
        out_shape=jax.ShapeDtypeStruct((b, SP, W), qkv.dtype),
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, SP, 3 * W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SP, SP), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, SP, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(qkv, bias)


def packed_main():
    g = np.random.default_rng(0)
    scale = DH ** -0.5
    qkv = g.standard_normal((B, SP, 3 * W)).astype(np.float32)
    qkv[:, S:] = 0.0
    bias = jnp.full((SP, SP), -1e30, jnp.float32).at[:, :S].set(0.0)

    # numerics vs xla_ref on a slice
    def unpack(x):
        q = x[..., :W].reshape(B, SP, H, DH).transpose(0, 2, 1, 3)
        k = x[..., W:2 * W].reshape(B, SP, H, DH).transpose(0, 2, 1, 3)
        v = x[..., 2 * W:].reshape(B, SP, H, DH).transpose(0, 2, 1, 3)
        return (q.reshape(B * H, SP, DH)[:, :S],
                k.reshape(B * H, SP, DH)[:, :S],
                v.reshape(B * H, SP, DH)[:, :S])

    q_, k_, v_ = unpack(qkv)
    want = np.asarray(xla_ref(jnp.asarray(q_[:24]), jnp.asarray(k_[:24]),
                              jnp.asarray(v_[:24]), scale))
    got_full = np.asarray(mha_packed(jnp.asarray(qkv[:2]), bias, scale, 2))
    got = got_full[:, :S].reshape(2, S, H, DH).transpose(0, 2, 1, 3)
    got = got.reshape(2 * H, S, DH)
    err = np.abs(got - want).max()
    print(f"packed fp32 max err vs XLA: {err:.2e}", flush=True)
    assert err < 2e-5

    qkvb = jnp.asarray(qkv, jnp.bfloat16)
    for GB in (1, 2, 4, 8):
        try:
            t = timeit(lambda a: mha_packed(a, bias, scale, GB), qkvb)
            print(f"packed pallas Gb={GB}: {t*1e3:.3f} ms/layer", flush=True)
        except Exception as e:
            print(f"packed pallas Gb={GB}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)




# ---------------------------------------------------------------------------
# QKV-projection-fused kernel: x (post-LN) -> qkv matmul -> per-head
# attention, one program per image; W_qkv stays VMEM-resident across the
# grid (constant index_map -> fetched once). Saves the [B,S,3W] qkv
# tensor's HBM write+read (~232 MB/layer at B=128).


def _qkvattn_kernel(x_ref, w_ref, b_ref, bias_ref, out_ref, *, scale):
    x = x_ref[0]                                        # [S, W]
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    qkv = (jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ) + b_ref[:]).astype(x.dtype)                       # [S, 3W]
    for h in range(H):
        q = qkv[:, 64 * h: 64 * (h + 1)]
        k = qkv[:, W + 64 * h: W + 64 * (h + 1)]
        v = qkv[:, 2 * W + 64 * h: 2 * W + 64 * (h + 1)]
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
        out_ref[0, :, 64 * h: 64 * (h + 1)] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def qkvattn(x, w_qkv, b_qkv, bias, scale: float):
    """x: [B, S, W] post-LN; w_qkv: [W, 3W]; b_qkv: [3W]."""
    b = x.shape[0]
    s = x.shape[1]
    return pl.pallas_call(
        functools.partial(_qkvattn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, s, W), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3 * W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * W,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, w_qkv, b_qkv, bias)


def qkv_fused_main():
    g = np.random.default_rng(0)
    scale = DH ** -0.5
    x = g.standard_normal((B, S, W)).astype(np.float32)
    w = (g.standard_normal((W, 3 * W)) * 0.02).astype(np.float32)
    bvec = (g.standard_normal((3 * W,)) * 0.02).astype(np.float32)
    bias = jnp.zeros((S, S), jnp.float32)

    # numerics vs packed path fed by an XLA matmul
    qkv_host = x[:2] @ w + bvec
    want = np.asarray(mha_packed(
        jnp.asarray(np.pad(qkv_host, ((0, 0), (0, SP - S), (0, 0))),
                    jnp.float32),
        jnp.full((SP, SP), -1e30, jnp.float32).at[:, :S].set(0.0),
        scale, 1))[:, :S]
    got = np.asarray(qkvattn(jnp.asarray(x[:2]), jnp.asarray(w),
                             jnp.asarray(bvec), bias, scale))
    err = np.abs(got - want[:, :, :W]).max()
    print(f"qkv-fused fp32 max err vs packed: {err:.2e}", flush=True)

    xb = jnp.asarray(x, jnp.bfloat16)
    wb = jnp.asarray(w, jnp.bfloat16)
    bb = jnp.asarray(bvec, jnp.bfloat16)
    # compare against the two-stage path: XLA matmul + packed kernel
    biasp = jnp.full((SP, SP), -1e30, jnp.float32).at[:, :S].set(0.0)

    @jax.jit
    def two_stage(x_, w_, b_):
        qkv = jnp.einsum("bsw,wo->bso", x_, w_) + b_
        qkv = jnp.pad(qkv, ((0, 0), (0, SP - S), (0, 0)))
        return mha_packed(qkv, biasp, scale, 1)

    t2 = timeit(two_stage, xb, wb, bb)
    print(f"two-stage (XLA matmul + packed kernel): {t2*1e3:.3f} ms/layer",
          flush=True)
    t1 = timeit(lambda a, b_, c: qkvattn(a, b_, c, bias, scale), xb, wb, bb)
    print(f"qkv-fused kernel: {t1*1e3:.3f} ms/layer", flush=True)




# ---------------------------------------------------------------------------
# Whole-attention-sub-block kernel: x_raw -> LN -> qkv -> attention ->
# out_proj -> +residual, one program per image. Adds the LN and the
# attention-output materializations (~0.2 ms/layer) to the fused-QKV
# savings.


def _attnblock_kernel(x_ref, g_ref, be_ref, w_ref, b_ref, wo_ref, bo_ref,
                      bias_ref, out_ref, *, scale, eps=1e-5):
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
    for h in range(H):
        q = qkv[:, 64 * h: 64 * (h + 1)]
        k = qkv[:, W + 64 * h: W + 64 * (h + 1)]
        v = qkv[:, 2 * W + 64 * h: 2 * W + 64 * (h + 1)]
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
        ).astype(x.dtype)
        heads_out.append(o)
    attn = jnp.concatenate(heads_out, axis=-1)
    proj = (jax.lax.dot_general(
        attn, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + bo_ref[:]).astype(x.dtype)
    out_ref[0] = x + proj


@functools.partial(jax.jit, static_argnames=("scale",))
def attnblock(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias, scale: float):
    b, s, w = x.shape
    return pl.pallas_call(
        functools.partial(_attnblock_kernel, scale=scale),
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
    )(x, g_, be, w_qkv, b_qkv, w_out, b_out, bias)


def attnblock_main():
    g = np.random.default_rng(0)
    scale = DH ** -0.5
    x = g.standard_normal((B, S, W)).astype(np.float32)
    gamma = g.standard_normal((W,)).astype(np.float32) * 0.1 + 1.0
    beta = g.standard_normal((W,)).astype(np.float32) * 0.1
    w = (g.standard_normal((W, 3 * W)) * 0.02).astype(np.float32)
    bvec = (g.standard_normal((3 * W,)) * 0.02).astype(np.float32)
    wo = (g.standard_normal((W, W)) * 0.02).astype(np.float32)
    bo = (g.standard_normal((W,)) * 0.02).astype(np.float32)
    bias = jnp.zeros((S, S), jnp.float32)

    def ref(x, gamma, beta, w, bvec, wo, bo):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(x.dtype)
        qkv = jnp.einsum("bsw,wo->bso", y, w) + bvec
        def split(t):
            return t.reshape(x.shape[0], S, H, DH).transpose(0, 2, 1, 3)
        q, k, v = (split(qkv[..., :W]), split(qkv[..., W:2*W]), split(qkv[..., 2*W:]))
        s_ = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(scale, q.dtype)
        p = jax.nn.softmax(s_.astype(jnp.float32), -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], S, W)
        return x + (jnp.einsum("bsw,wo->bso", o, wo) + bo).astype(x.dtype)

    want = np.asarray(ref(jnp.asarray(x[:2]), gamma, beta, w, bvec, wo, bo))
    got = np.asarray(attnblock(jnp.asarray(x[:2]), jnp.asarray(gamma),
                               jnp.asarray(beta), jnp.asarray(w),
                               jnp.asarray(bvec), jnp.asarray(wo),
                               jnp.asarray(bo), bias, scale))
    err = np.abs(got - want).max()
    print(f"attnblock fp32 max err: {err:.2e}", flush=True)

    to_b = lambda a: jnp.asarray(a, jnp.bfloat16)
    xb, gb_, beb = to_b(x), to_b(gamma), to_b(beta)
    wb, bb, wob, bob = to_b(w), to_b(bvec), to_b(wo), to_b(bo)
    refj = jax.jit(ref)
    t0 = timeit(lambda *a: refj(*a), xb, gb_, beb, wb, bb, wob, bob)
    print(f"XLA whole sub-block: {t0*1e3:.3f} ms/layer", flush=True)
    t1 = timeit(lambda *a: attnblock(*a, bias, scale),
                xb, gb_, beb, wb, bb, wob, bob)
    print(f"attnblock kernel:    {t1*1e3:.3f} ms/layer", flush=True)


if __name__ == "__main__":
    import sys
    if "--packed" in sys.argv:
        packed_main()
        raise SystemExit
    if "--attnblock" in sys.argv:
        attnblock_main()
        raise SystemExit
    if "--qkv-fused" in sys.argv:
        qkv_fused_main()
        raise SystemExit
    main()
