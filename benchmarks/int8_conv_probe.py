"""Does XLA lower int8 convolutions to the double-rate MXU path on v5e?

The RN50x4 serving ledger (BASELINE.md r3) pins the conv stack at
44.4 of 47.9 ms per B=128 batch with no RN-specific kernel win found
bf16-side. int8 is the untried axis: the MXU runs int8×int8→int32 at
2× the bf16 rate, IF XLA's conv emitter uses it. This probe times
bf16 vs int8 `lax.conv_general_dilated` at the production RN50x4
bottleneck shapes (NHWC, B=64) before we invest in a quantized conv
path. Reference tower being optimized: open_clip modified ResNet used
at /root/reference/run/train/train_fiq.py:49 (RN50x4, 4/5 recipes).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 64
# (label, H, Cin, Cout, kernel, stride)
SHAPES = [
    ("stem3x3 144^2 40->80", 144, 40, 80, 3, 1),
    ("s1 3x3 72^2 80", 72, 80, 80, 3, 1),
    ("s1 1x1 72^2 80->320", 72, 80, 320, 1, 1),
    ("s2 3x3 36^2 160", 36, 160, 160, 3, 1),
    ("s2 1x1 36^2 640->160", 36, 640, 160, 1, 1),
    ("s3 3x3 18^2 320", 18, 320, 320, 3, 1),
    ("s3 1x1 18^2 1280->320", 18, 1280, 320, 1, 1),
    ("s4 3x3 9^2 640", 9, 640, 640, 3, 1),
    ("s4 1x1 9^2 2560->640", 9, 2560, 640, 1, 1),
]
DN = ("NHWC", "HWIO", "NHWC")


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def time_fn(fn, *args, iters=20):
    sync(fn(*args))
    sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    tot = {"bf16": 0.0, "int8": 0.0}
    for label, h, cin, cout, k, s in SHAPES:
        x = rng.standard_normal((B, h, h, cin)).astype(np.float32)
        w = rng.standard_normal((k, k, cin, cout)).astype(np.float32)

        @jax.jit
        def conv_bf16(x, w):
            return lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (s, s), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.float32)

        @jax.jit
        def conv_int8(xq, wq):
            return lax.conv_general_dilated(
                xq, wq, (s, s), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32)

        xq = jnp.asarray(np.clip(x * 10, -127, 127).astype(np.int8))
        wq = jnp.asarray(np.clip(w * 10, -127, 127).astype(np.int8))
        xb = jnp.asarray(x)
        wb = jnp.asarray(w)
        t_b = time_fn(conv_bf16, xb, wb)
        t_q = time_fn(conv_int8, xq, wq)
        tot["bf16"] += t_b
        tot["int8"] += t_q
        flops = 2 * B * (h // s) ** 2 * k * k * cin * cout
        print(f"{label:26s} bf16 {t_b:7.3f} ms ({flops/t_b/1e9:6.1f} TF/s)"
              f"  int8 {t_q:7.3f} ms ({flops/t_q/1e9:6.1f} TOP/s)"
              f"  ratio {t_b/t_q:4.2f}x", flush=True)
    print(f"{'TOTAL':26s} bf16 {tot['bf16']:7.3f} ms"
          f"  int8 {tot['int8']:7.3f} ms"
          f"  ratio {tot['bf16']/tot['int8']:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
