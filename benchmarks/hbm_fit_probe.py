"""RN50x4@288 full-train-step HBM fit ladder (VERDICT r4 #1).

Answers "does the reference's per-rank batch 1024 fit one v5e chip?"
(`/root/reference/README.md:45`: RN50x4, input 288, per-rank batch
1024) by compiling and running the REAL full (non-cached) train step —
2× frozen RN50x4 towers fwd + text tower + fusion fwd/bwd + Adam, bf16
policy, uint8 image feed, donation on (exactly `Trainer`'s program) —
at a descending batch ladder, recording peak HBM and step time per
rung.

Batches are created ON DEVICE (`jax.random` inside jit): the probe
measures the chip's memory/compute position, not this host's 8 MB/s
tunnel (BASELINE.md u8-feed ledger owns the transfer story; the soak
ledger owns the sustained-from-host story).

Each rung runs in a subprocess so an OOM rung cannot poison the next.

Run (on-chip):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hbm_fit_probe.py \
      ladder --batches 1024,512,256,128
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compile cache: rung reruns (and flake retries) skip the
# multi-minute RN50x4@288 compile. Env vars so subprocess rungs inherit.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fashionern/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def run_one(args) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
    from fashionern_aaai2024_tpu.train.state import (
        cast_frozen_clip_bf16, create_train_state,
    )
    from fashionern_aaai2024_tpu.train.step import build_train_step

    B = args.batch
    cfg = get_clip_config(args.model, activation="quick_gelu")
    v = cfg.vision
    model = ComposedCIRModel(cfg, patch_num=13)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, cfg.text.context_length), np.int32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        deterministic=False, method=model.train_forward,
    )
    opt = optax.adam(4e-5)
    state = cast_frozen_clip_bf16(create_train_state(variables, opt, rng))
    step = build_train_step(model, opt)  # donation on — Trainer's program

    @jax.jit
    def make_batch(key):
        ks = jax.random.split(key, 5)
        img = lambda k: jax.random.randint(  # noqa: E731
            k, (B, v.image_size, v.image_size, 3), 0, 256, jnp.uint8)
        return {
            "ref_image": img(ks[0]),
            "tar_image": img(ks[1]),
            "text_ids": jax.random.randint(
                ks[2], (B, cfg.text.context_length), 0, 40000, jnp.int32),
            "ref_patch": jax.random.normal(ks[3], (B, 13, cfg.feature_dim)),
            "tar_patch": jax.random.normal(ks[4], (B, 13, cfg.feature_dim)),
        }

    out = {"model": args.model, "input": v.image_size, "batch": B}
    try:
        t_compile = time.perf_counter()
        batch = make_batch(jax.random.PRNGKey(1))
        # AOT lower+compile so XLA's static memory analysis is readable:
        # device memory_stats() is unavailable through the axon tunnel,
        # but the compiler's HBM budget (arguments + outputs + temps) is
        # the fit answer VERDICT r3 #1 asks for.
        compiled = step.lower(state, batch).compile()
        try:
            ma = compiled.memory_analysis()
            out["hbm_compiler_gib"] = {
                "arguments": round(ma.argument_size_in_bytes / 2**30, 2),
                "outputs": round(ma.output_size_in_bytes / 2**30, 2),
                "temps": round(ma.temp_size_in_bytes / 2**30, 2),
                "aliased": round(ma.alias_size_in_bytes / 2**30, 2),
                # live peak ≈ args + outputs + temps − donated aliases
                "peak_est": round(
                    (ma.argument_size_in_bytes + ma.output_size_in_bytes
                     + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
                    / 2**30, 2),
            }
        except Exception as e:  # noqa: BLE001 — analysis is best-effort
            out["hbm_compiler_gib"] = f"unavailable: {e}"
        step = compiled  # reuse the AOT executable for the loop
        state, loss = step(state, batch)
        float(loss)  # sync through the compile step
        out["compile_s"] = round(time.perf_counter() - t_compile, 1)
        # donation consumed `batch`; regenerate per step (cheap, on-device)
        times = []
        for i in range(args.steps):
            batch = make_batch(jax.random.PRNGKey(2 + i))
            jax.block_until_ready(batch)
            t0 = time.perf_counter()
            state, loss = step(state, batch)
            float(loss)
            times.append(time.perf_counter() - t0)
        t = sorted(times)[len(times) // 2]
        out.update(ok=True, step_ms=round(t * 1e3, 1),
                   samples_per_s=round(B / t, 1),
                   loss=float(loss))
    except Exception as e:  # noqa: BLE001 — OOM rung must report, not die
        msg = str(e)
        out.update(ok=False,
                   oom="RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower(),
                   error=msg[:300])
    try:
        stats = jax.local_devices()[0].memory_stats()
        out["hbm_peak_gib"] = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        out["hbm_limit_gib"] = round(stats.get("bytes_limit", 0) / 2**30, 2)
    except Exception:
        out["hbm_peak_gib"] = None
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["one", "ladder"])
    p.add_argument("--model", default="RN50x4")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--batches", default="1024,512,256,128")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default="/tmp/hbm_fit.json")
    args = p.parse_args()

    if args.mode == "one":
        print("RESULT " + json.dumps(run_one(args)), flush=True)
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        print(f"[fit] trying batch {b}", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one",
             "--model", args.model, "--batch", str(b),
             "--steps", str(args.steps)],
            env=env, capture_output=True, text=True, timeout=1800)
        row = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                row = json.loads(line[len("RESULT "):])
        if row is None:
            row = {"batch": b, "ok": False,
                   "error": (r.stderr or r.stdout)[-300:]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if row.get("ok"):
            break  # largest fitting batch found; smaller rungs fit a fortiori
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    fitting = [r for r in rows if r.get("ok")]
    if fitting:
        r = fitting[0]
        print(f"[fit] largest fitting batch: {r['batch']} "
              f"(peak {r.get('hbm_peak_gib')} GiB, {r['step_ms']} ms/step, "
              f"{r['samples_per_s']} samples/s)")
    else:
        print("[fit] NO rung fit — see rows")


if __name__ == "__main__":
    main()
