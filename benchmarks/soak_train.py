"""Recipe-scale training soak + kill/resume parity drive (VERDICT r3 #1).

Runs the REAL Trainer (loader, caption rng, validation cadence, periodic
checkpoints) at the reference's recipe shapes — RN50x4, input 288
(`/root/reference/README.md:45`: lr 4e-5, per-rank batch 1024, the
primary backbone of 4 of 5 recipes) — on the attached chip, over a
synthetic FashionIQ-shaped dataset (the real datasets are not present in
this environment; shapes, dtypes, and the full step program are the
recipe's).

Measures per-step loss + wall time, HBM high-water, validation-epoch
cost, and steps/s stability. Modes:

  control  — run --steps steps uninterrupted, log per-step losses
  kill     — same run but os._exit(37) at --kill-at (a real SIGKILL-
             grade death: no teardown, no final checkpoint; the last
             periodic checkpoint is all a resumed run gets)
  resume   — restore from the checkpoint dir and run to --steps
  verify   — compare control vs (kill + resume) loss logs: every step
             from the resume point must match the control bitwise

Orchestrated end-to-end by `python benchmarks/soak_train.py full ...`.

Run (on-chip):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/soak_train.py \
      full --model RN50x4 --input 288 --batch 1024 --steps 300
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compile cache (works through the axon backend): a leg
# retried after a transient tunnel flake skips its multi-minute compile.
# Env vars so subprocess legs inherit it before they import jax.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fashionern/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


class SyntheticFIQ:
    """FashionIQ-shaped triplets at recipe image size. Items are
    generated per-index from a seeded rng (deterministic across runs
    and processes) over a small unique-image universe."""

    def __init__(self, n_items: int, image_size: int, feature_dim: int,
                 n_images: int = 64, seed: int = 0, image_dtype: str = "uint8"):
        self.n_items = n_items
        self.image_size = image_size
        self.feature_dim = feature_dim
        g = np.random.default_rng(seed)
        dt = np.uint8 if image_dtype == "uint8" else np.float32
        scale = 255 if image_dtype == "uint8" else 1.0
        self.images = (g.random((n_images, image_size, image_size, 3),
                                np.float32) * scale).astype(dt)
        self.n_images = n_images
        self.seed = seed

    def __len__(self):
        return self.n_items

    def __getitem__(self, i):
        g = np.random.default_rng(self.seed * 1_000_003 + i)
        a = int(g.integers(0, self.n_images))
        b = int((a + 1 + g.integers(0, self.n_images - 1)) % self.n_images)
        return {
            "ref_name": f"img{a}",
            "tar_name": f"img{b}",
            "captions": ["make it red", "with longer sleeves"],
            "ref_image": self.images[a],
            "tar_image": self.images[b],
            "ref_patch": g.standard_normal((13, self.feature_dim))
                          .astype(np.float32),
            "tar_patch": g.standard_normal((13, self.feature_dim))
                          .astype(np.float32),
        }


def hbm_peak_gib() -> float | None:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return None


def hash_tokenizer(texts, context_length=77):
    """Deterministic stand-in for the BPE tokenizer (the real merges
    table is un-vendorable on this zero-egress host — BASELINE.md §BPE);
    same id distribution shape, same context padding."""
    import zlib

    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        # crc32, not hash(): str hash is per-process randomized and the
        # control/kill/resume legs are separate processes
        h = [zlib.crc32(w.encode()) % 49000 + 1
             for w in t.split()][: context_length]
        out[i, : len(h)] = h
    return out


def build_trainer(args, log_path):
    from fashionern_aaai2024_tpu.train.trainer import (
        DatasetPlugin, TrainConfig, Trainer, _fiq_captions,
    )
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config

    clip_cfg = get_clip_config(args.model, activation="quick_gelu")
    n_items = args.batch * args.steps_per_epoch
    ds = SyntheticFIQ(n_items, clip_cfg.vision.image_size,
                      clip_cfg.feature_dim, image_dtype=args.image_dtype)
    plugin = DatasetPlugin("synthetic-fiq", lambda c: ds, _fiq_captions)

    validator = None
    if args.validate_every:
        from fashionern_aaai2024_tpu.data.loader import Loader
        from fashionern_aaai2024_tpu.retrieval import evaluate as E

        g = np.random.default_rng(5)
        vsz = clip_cfg.vision.image_size
        gal = [{"name": f"img{i}",
                "image": (g.random((vsz, vsz, 3), np.float32)),
                "patch": g.standard_normal((13, clip_cfg.feature_dim))
                          .astype(np.float32)}
               for i in range(32)]
        rel = [{"ref_name": f"img{i}", "tar_name": f"img{(i + 3) % 32}",
                "captions": ["is red", "has sleeves"],
                "ref_patch": g.standard_normal((13, clip_cfg.feature_dim))
                              .astype(np.float32)}
               for i in range(16)]

        def validator(api):
            m = E.evaluate_fiq_split(api, Loader(gal, 16, num_workers=0),
                                     Loader(rel, 16, num_workers=0),
                                     ks=(10, 50))
            return m["recall_at10"], m

    epochs = -(-args.steps // args.steps_per_epoch)
    cfg = TrainConfig(
        dataset="fashioniq", clip_model_name=args.model,
        batch_size=args.batch, lr=4e-5, num_epochs=epochs,
        validation_frequency=max(1, args.validate_every),
        print_frequency=10**9, ckpt_dir=args.ckpt_dir, seed=11,
        num_workers=args.workers, precision=args.precision,
        image_dtype=args.image_dtype,
        max_steps_per_epoch=args.steps_per_epoch,
        ckpt_every_steps=args.ckpt_every,
        resume_path=args.resume_from or None,
        log_path=None, eval_batch_size=16,
    )
    tr = Trainer(cfg, model=None, train_dataset=ds, plugin=plugin,
                 validator=validator, tokenizer=hash_tokenizer)

    logf = open(log_path, "a", buffering=1)
    orig = tr.step_fn
    tstate = {"last": None}

    def recording_step(state, batch):
        state, loss = orig(state, batch)
        lv = float(loss)  # sync: honest per-step wall time
        now = time.perf_counter()
        dt = None if tstate["last"] is None else now - tstate["last"]
        tstate["last"] = now
        rec = {"step": tr.global_step + 1, "loss": lv,
               "step_s": None if dt is None else round(dt, 4)}
        if (tr.global_step + 1) % 50 == 0:
            rec["hbm_peak_gib"] = hbm_peak_gib()
        logf.write(json.dumps(rec) + "\n")
        if args.kill_at and tr.global_step + 1 >= args.kill_at:
            logf.write(json.dumps({"killed_at": tr.global_step + 1}) + "\n")
            logf.close()
            os._exit(37)  # no teardown: the periodic ckpt is the survivor
        return state, loss

    tr.step_fn = recording_step
    return tr


def run_leg(args) -> None:
    t0 = time.time()
    tr = build_trainer(args, args.log)
    state = tr.train()
    with open(args.log, "a") as f:
        f.write(json.dumps({
            "done": True, "mode": args.mode, "final_step": int(state.step),
            "wall_s": round(time.time() - t0, 1),
            "hbm_peak_gib": hbm_peak_gib(),
        }) + "\n")


def read_losses(path):
    out = {}
    for line in open(path):
        r = json.loads(line)
        if "step" in r:
            out[r["step"]] = r["loss"]
    return out


def verify(control_log, resumed_log, resume_start):
    c = read_losses(control_log)
    r = read_losses(resumed_log)
    steps = sorted(s for s in r if s >= resume_start)
    assert steps, "resumed run logged no steps"
    mismatches = [s for s in steps if c.get(s) != r[s]]
    return {"compared_steps": len(steps), "mismatches": len(mismatches),
            "first_mismatch": mismatches[0] if mismatches else None,
            "resume_start": resume_start}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["control", "kill", "resume", "full"])
    p.add_argument("--model", default="RN50x4")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--steps-per-epoch", type=int, default=50)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--image-dtype", default="uint8")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--validate-every", type=int, default=2)  # epochs
    p.add_argument("--ckpt-every", type=int, default=50)
    p.add_argument("--kill-at", type=int, default=0)
    p.add_argument("--resume-from", default="")
    p.add_argument("--ckpt-dir", default="/tmp/soak_ckpt")
    p.add_argument("--log", default="/tmp/soak.jsonl")
    p.add_argument("--out", default="/tmp/soak_summary.json")
    args = p.parse_args()

    if args.mode != "full":
        run_leg(args)
        return

    # orchestrate: control -> kill -> resume -> verify, in subprocesses
    # (the kill leg dies with os._exit; each leg gets a fresh backend)
    base = [sys.executable, os.path.abspath(__file__)]
    common = ["--model", args.model, "--batch", str(args.batch),
              "--steps", str(args.steps),
              "--steps-per-epoch", str(args.steps_per_epoch),
              "--precision", args.precision,
              "--image-dtype", args.image_dtype,
              "--workers", str(args.workers),
              "--validate-every", str(args.validate_every),
              "--ckpt-every", str(args.ckpt_every)]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    ctl_log, kill_log = "/tmp/soak_control.jsonl", "/tmp/soak_kill.jsonl"
    res_log = "/tmp/soak_resumed.jsonl"
    for f in (ctl_log, kill_log, res_log):
        if os.path.exists(f):
            os.remove(f)
    kill_at = args.steps // 2 + args.ckpt_every // 2 + 1
    # the dying step never writes its own checkpoint (os._exit fires in
    # the step wrapper, before train_one_epoch's periodic save): the
    # survivor is the last multiple of ckpt_every STRICTLY before kill_at
    resume_start = ((kill_at - 1) // args.ckpt_every) * args.ckpt_every + 1

    def run_retrying(cmd, log, ckpt_dir, expect_rc=0, attempts=3,
                     wipe_ckpt=True):
        """The axon tunnel occasionally drops a remote_compile response
        (INTERNAL: response body closed mid-read). Legs are deterministic
        and the persistent compile cache makes a rerun cheap, so retry a
        flaked leg from scratch (fresh log + ckpt dir)."""
        import shutil

        for i in range(attempts):
            if os.path.exists(log):
                os.remove(log)
            if wipe_ckpt and os.path.isdir(ckpt_dir):
                shutil.rmtree(ckpt_dir)
            rc = subprocess.run(cmd, env=env).returncode
            if rc == expect_rc:
                return
            print(f"[soak] leg rc={rc} (want {expect_rc}), "
                  f"attempt {i + 1}/{attempts}", flush=True)
        raise SystemExit(f"leg failed after {attempts} attempts (rc={rc})")

    print(f"[soak] control: {args.steps} steps", flush=True)
    run_retrying(base + ["control", "--ckpt-dir", "/tmp/soak_ckpt_ctl",
                         "--log", ctl_log] + common,
                 ctl_log, "/tmp/soak_ckpt_ctl")
    print(f"[soak] kill leg: dies at step {kill_at}", flush=True)
    run_retrying(base + ["kill", "--kill-at", str(kill_at),
                         "--ckpt-dir", "/tmp/soak_ckpt_kill",
                         "--log", kill_log] + common,
                 kill_log, "/tmp/soak_ckpt_kill", expect_rc=37)
    print(f"[soak] resume from step {resume_start - 1} ckpt", flush=True)
    run_retrying(base + ["resume",
                         "--resume-from", "/tmp/soak_ckpt_kill/fashioniq-resume",
                         "--ckpt-dir", "/tmp/soak_ckpt_kill",
                         "--log", res_log] + common,
                 res_log, "/tmp/soak_ckpt_kill", wipe_ckpt=False)

    v = verify(ctl_log, res_log, resume_start)
    ctl = [json.loads(l) for l in open(ctl_log)]
    steps = [r for r in ctl if "step" in r and r.get("step_s")]
    times = sorted(r["step_s"] for r in steps[5:])
    summary = {
        "model": args.model, "batch": args.batch, "steps": args.steps,
        "precision": args.precision,
        "kill_at": kill_at, "resume_start": resume_start,
        "parity": v,
        "step_s_p50": times[len(times) // 2] if times else None,
        "step_s_p90": times[int(0.9 * len(times))] if times else None,
        "samples_per_s": (round(args.batch / times[len(times) // 2], 1)
                          if times else None),
        "hbm_peak_gib": max((r.get("hbm_peak_gib") or 0) for r in ctl),
        "loss_first": steps[0]["loss"] if steps else None,
        "loss_last": steps[-1]["loss"] if steps else None,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    assert v["mismatches"] == 0, f"RESUME PARITY FAILED: {v}"
    print("[soak] resume-continuation parity: EXACT")


if __name__ == "__main__":
    main()
