"""Which matmul dims pay 128-padding on the v5e MXU?

Settles the layout question for the RN50x4 bottleneck kernel: the
stage-1 convs have Cout=80/Cin=80 — in spatial-major form those land on
the 128-lane axis (pad 1.6x); in channel-major (transposed) form they
land on M/K. This times dot_general at the candidate shapes so the
kernel design is driven by measured padding behavior, not guesses.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 128 * 72 * 72  # stage-1 spatial x batch


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


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


def run(m, k, n, label):
    g = np.random.default_rng(0)
    a = jnp.asarray(g.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(g.standard_normal((k, n)), jnp.bfloat16)

    @jax.jit
    def f(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)

    t = timeit(f, a, b)
    fl = 2 * m * k * n
    print(f"{label:42s} [{m:6d},{k:5d}]x[{k:5d},{n:8d}] "
          f"{t*1e3:7.2f} ms {fl/t/1e12:6.1f} TF/s", flush=True)
    return t


def main():
    print("devices:", jax.devices(), flush=True)
    # N-dim (lane) padding reference pair
    run(N, 320, 128, "spatial-major 1x1 (N=128 ref)")
    run(N, 320, 80, "spatial-major 1x1 conv1 (N=80, pads lanes)")
    # transposed: tiny M
    run(80, 320, N, "transposed conv1 (M=80)")
    run(128, 320, N, "transposed conv1 (M=128 ref)")
    run(256, 320, N, "transposed (M=256 ref)")
    # tiny K (conv2 per-tap, transposed)
    run(80, 80, N, "transposed conv2 tap (K=80, pads?)")
    run(80, 128, N, "transposed conv2 tap (K=128 ref)")
    run(80, 720, N, "transposed conv2 im2col (K=720)")
    # conv3 both ways
    run(N, 80, 320, "spatial-major conv3 (K=80)")
    run(320, 80, N, "transposed conv3 (M=320 K=80)")


if __name__ == "__main__":
    main()
