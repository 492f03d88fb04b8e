"""RN50x4 conv-stack stage roofline (real TPU).

The r3 RN ledger pinned the tower at 47.9 ms/B=128 (conv stack ~44 ms)
with "conv scheduling is XLA's" as the position. Before building a
fused-bottleneck Pallas kernel (the conv analog of the attention/MLP
sub-block kernels), this probe answers WHERE the 44 ms goes and what
the per-stage speed-of-light is:

  A. per-stage chains of the regular (stride-1, no-downsample)
     bottlenecks, in-model form (chained, hidden tensors live), bf16
  B. nominal vs padded-FLOPs rooflines per stage (per-tap padding
     model vs im2col padding model — which one XLA's emitter pays)
  C. conv2(3x3)-only A/B per stage: lax.conv vs im2col
     (conv_general_dilated_patches + dot) — is reformulation free money?

Reference tower being optimized: open_clip modified ResNet
(RN50x4, 4/5 reference recipes, /root/reference/README.md:45-57).
"""

from __future__ import annotations

import functools
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fashionern_aaai2024_tpu.models.clip import resnet as R

B = 128
# (stage, planes, spatial, n_regular_blocks)
STAGES = [(1, 80, 72, 3), (2, 160, 36, 5), (3, 320, 18, 9), (4, 640, 9, 5)]


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def timeit(fn, *args, iters=10, windows=3):
    sync(fn(*args))
    sync(fn(*args))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def cast_bf16(v):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)


class Chain(nn.Module):
    planes: int
    n: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = R.Bottleneck(self.planes, 1, name=f"b{i}")(x, train=False)
        return x


def pad128(c):
    return -(-c // 128) * 128


def stage_flops(p, s, n, batch):
    """(nominal, padded_per_tap, padded_im2col) FLOPs for n regular blocks."""
    nom = 34 * p * p * s * s * n * batch  # 34 p^2 S^2 FLOPs/block
    c4, c1 = 4 * p, p
    # per-tap: each of 9 taps contracts pad(Cin)
    pt = (4 * pad128(c4) * pad128(c1) + 9 * pad128(c1) * pad128(c1)
          + 4 * pad128(c1) * pad128(c4)) * 2 * s * s * n * batch
    im = (4 * pad128(c4) * pad128(c1) + pad128(9 * c1) * pad128(c1)
          + 4 * pad128(c1) * pad128(c4)) * 2 * s * s * n * batch
    return nom, pt, im


def main():
    print("devices:", jax.devices(), flush=True)
    g = np.random.default_rng(0)
    total = 0.0
    for stage, p, s, n in STAGES:
        m = Chain(p, n)
        x32 = np.asarray(g.standard_normal((B, s, s, 4 * p)), np.float32)
        v = m.init(jax.random.PRNGKey(stage), x32[:2])
        vb = cast_bf16(v)
        xb = jnp.asarray(x32, jnp.bfloat16)
        f = jax.jit(lambda v, x, m=m: m.apply(v, x))
        t = timeit(f, vb, xb)
        total += t
        nom, pt, im = stage_flops(p, s, n, B)
        print(f"stage{stage} (p={p:4d} S={s:2d} n={n}) chain {t*1e3:7.2f} ms "
              f"| {nom/t/1e12:6.1f} TF/s nominal "
              f"| roofline@142TF/s: per-tap {pt/142e12*1e3:6.2f} ms, "
              f"im2col {im/142e12*1e3:6.2f} ms", flush=True)

        # C. conv2-only A/B
        y32 = np.asarray(g.standard_normal((B, s, s, p)), np.float32)
        w32 = np.asarray(g.standard_normal((3, 3, p, p)), np.float32)
        yb = jnp.asarray(y32, jnp.bfloat16)
        wb = jnp.asarray(w32, jnp.bfloat16)

        @jax.jit
        def conv_xla(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        @jax.jit
        def conv_im2col(x, w):
            pat = lax.conv_general_dilated_patches(
                x, (3, 3), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # patches channel layout is [Cin, 3, 3]-major per position
            wi = jnp.transpose(w, (2, 0, 1, 3)).reshape(9 * w.shape[2], -1)
            out = jnp.dot(pat.reshape(-1, pat.shape[-1]), wi,
                          preferred_element_type=jnp.float32)
            return out.reshape(x.shape[0], x.shape[1], x.shape[2],
                               -1).astype(jnp.bfloat16)

        ta = timeit(conv_xla, yb, wb)
        tb = timeit(conv_im2col, yb, wb)
        cf = 18 * p * p * s * s * B
        print(f"  conv2 3x3 only: lax.conv {ta*1e3:6.2f} ms "
              f"({cf/ta/1e12:5.1f} TF/s)  im2col {tb*1e3:6.2f} ms "
              f"({cf/tb/1e12:5.1f} TF/s)", flush=True)
    print(f"regular-bottleneck chains total {total*1e3:.2f} ms "
          f"(tower r3 ledger: 47.9 ms at B=128)", flush=True)


if __name__ == "__main__":
    main()
