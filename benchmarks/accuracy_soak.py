"""Accuracy soak (VERDICT r4 #9): train→validate→select→export→serve,
one consistent chain on real hardware.

Protocol (all through public surfaces — the CLI and the artifact API):
  1. `fashionern make-fixture <dataset> --n-images 64 --n-triplets 128`
     — large enough that recall@10 over the gallery is a sharp metric
     (the default plumbing fixture saturates at 100).
  2. `fashionern eval` with the UNTRAINED fusion init → baseline recalls.
  3. `fashionern train` full ViT-B-16, validation every epoch selecting
     the best checkpoint on the dataset's headline metric — hundreds of
     real steps.
  4. `fashionern eval --fusion-model-path <best>` → trained recalls
     (must beat the untrained baseline decisively: the soak's
     learning-happened evidence).
  5. `fashionern export --fusion-model-path <best>` → AOT artifact.
  6. In-process: build the live service (same ckpt) AND load the
     artifact; run every val relative query through BOTH; assert the
     per-query top-k names are IDENTICAL and the combined-gallery
     recalls are equal — train→select→export→serve returns the same
     answers end to end.

Supports all four dataset families. fashion200k uses its multi-positive
pair protocol (gallery ids are CAPTIONS; any top-K image sharing the
target caption counts, `run/test/test_200k.py:53-60`) with the opt-in
`--validate-200k` in-training validation for best-ckpt selection (the
reference skips in-training validation for 200k at real scale).

Writes a ledger JSON (--out) for BASELINE.md.

Run (on-chip):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/accuracy_soak.py \
      --epochs 15 --out /tmp/accuracy_soak.json
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
CLI = [sys.executable, "-m", "fashionern_aaai2024_tpu.cli.main"]

# The CLI enables its own persistent compile cache; export the env form
# too so the in-process step-6 jits share it, and so a leg retried after
# a transient tunnel flake skips its compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fashionern/jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def run_cli(args_list, env, tag, capture_json=False, attempts=3, clean=(),
            stage_timeout=5400):
    """`stage_timeout` is a hung-RPC watchdog, not a perf budget: a
    tunnel outage can leave a CLI child blocked forever on a dead RPC
    (observed: a train stage at ~35 s of CPU after 45 min of wall);
    the timeout kills it and retries like any other transient flake —
    every stage is idempotent under the banking protocol."""
    print(f"[soak] $ fashionern {' '.join(args_list)}", flush=True)
    t0 = time.time()
    for i in range(attempts):
        for path in clean:  # append-mode logs must not survive a retry
            if os.path.exists(path):
                os.remove(path)
        try:
            r = subprocess.run(CLI + args_list, env=env, capture_output=True,
                               text=True, timeout=stage_timeout)
        except subprocess.TimeoutExpired:
            if i + 1 >= attempts:
                raise SystemExit(f"{tag} hung past {stage_timeout}s "
                                 f"{attempts} times")
            print(f"[soak] {tag}: hung past {stage_timeout}s (dead tunnel "
                  f"RPC?), killed; retry {i + 2}/{attempts}", flush=True)
            continue
        if r.returncode == 0:
            break
        transient = any(sig in r.stderr for sig in (
            "remote_compile", "INTERNAL", "FAILED_PRECONDITION",
            "UNAVAILABLE", "DEADLINE_EXCEEDED"))
        print(r.stdout[-2000:], r.stderr[-2000:], sep="\n---\n")
        if not (transient and i + 1 < attempts):
            raise SystemExit(f"{tag} failed rc={r.returncode}")
        print(f"[soak] {tag}: transient tunnel flake, retry "
              f"{i + 2}/{attempts}", flush=True)
    dt = time.time() - t0
    print(f"[soak] {tag} done in {dt:.0f}s", flush=True)
    if capture_json:
        for line in reversed(r.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line), dt
        raise SystemExit(f"{tag}: no JSON line in output")
    return r.stdout, dt


def iter_queries(dataset: str, root: str):
    """(ref_name, eval-protocol caption, tar_name) for every val query."""
    if dataset == "fashioniq":
        from fashionern_aaai2024_tpu.data.captions import join_fiq_captions
        from fashionern_aaai2024_tpu.data.fashioniq import FashionIQDataset

        rel = FashionIQDataset(root, "val", ["dress", "shirt", "toptee"],
                               mode="relative", dim=224)
        return [(it["ref_name"], join_fiq_captions(*it["captions"][:2]),
                 it["tar_name"]) for it in (rel[i] for i in range(len(rel)))]
    if dataset == "fashion200k":
        # multi-positive protocol: ref/tar "names" are CAPTION ids (the
        # gallery uses them as item names, so any image of the target
        # caption class counts as a hit)
        from fashionern_aaai2024_tpu.data.fashion200k import (
            Fashion200kTestQueryDataset,
        )

        rel = Fashion200kTestQueryDataset(root, split="test", dim=224)
        return [(it["ref_id"], it["caption"], it["tar_id"])
                for it in (rel[i] for i in range(len(rel)))]
    if dataset == "cirr":
        from fashionern_aaai2024_tpu.data.cirr import CIRRDataset

        rel = CIRRDataset(root, "val", mode="relative", dim=224)
    else:
        from fashionern_aaai2024_tpu.data.shoes import ShoesDataset

        rel = ShoesDataset(root, "val", mode="relative", dim=224)
    return [(it["ref_name"], it["caption"], it["tar_name"])
            for it in (rel[i] for i in range(len(rel)))]


# the trainer/eval headline key each dataset selects its best ckpt on
METRIC_KEY = {"fashioniq": "avg", "cirr": "headline", "shoes": "avg",
              "fashion200k": "avg"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="fashioniq",
                   choices=sorted(METRIC_KEY))
    p.add_argument("--work", default="/tmp/accuracy_soak")
    p.add_argument("--model", default="ViT-B-16")
    p.add_argument("--n-images", type=int, default=64)
    p.add_argument("--n-triplets", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--out", default="/tmp/accuracy_soak.json")
    p.add_argument("--learnable", action="store_true",
                   help="attribute-signal fixture: captions describe the "
                        "target, so held-out val recall can actually rise "
                        "(the default fixture has no caption↔image signal; "
                        "its val curve is a noise floor by construction)")
    p.add_argument("--tme", action="store_true",
                   help="train/eval/export with the TME text-enhancement "
                        "module (trainable, ERN subtree) — the VERDICT r4 "
                        "#6 learning demonstration")
    p.add_argument("--resume", action="store_true",
                   help="reuse completed stages recorded in <work>/stages.json "
                        "(idempotent retry after a tunnel flake or script fix)")
    args = p.parse_args()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    root = os.path.join(args.work, "fixture")
    ck = os.path.join(args.work, "ckpt")
    art = os.path.join(args.work, "artifact")
    os.makedirs(args.work, exist_ok=True)
    bpe = os.path.join(root, "bpe.txt.gz")
    mkey = METRIC_KEY[args.dataset]
    common = ["--dataset", args.dataset, "--data-root", root,
              "--clip-model-name", args.model, "--bpe-path", bpe,
              "--num-workers", "0"] + (["--tme"] if args.tme else [])

    # completed stages are memoized in the work dir so a retried run (a
    # tunnel flake, or a fix to the in-process leg below) skips the
    # expensive CLI legs it has already banked
    stage_path = os.path.join(args.work, "stages.json")
    stages = {}
    if args.resume and os.path.exists(stage_path):
        with open(stage_path) as f:
            stages = json.load(f)
        print(f"[soak] resuming; banked stages: {sorted(stages)}", flush=True)

    def bank(key, value=True):
        stages[key] = value
        with open(stage_path, "w") as f:
            json.dump(stages, f)
        return value

    # 1. fixture (fashion200k sizes by per-class images + query count;
    # the triplet datasets by per-type image/triplet universes)
    if "fixture" not in stages:
        if args.dataset == "fashion200k":
            sizing = ["--n-per-color", str(max(2, args.n_images // 8)),
                      "--n-queries", str(args.n_triplets)]
        else:
            sizing = ["--n-images", str(args.n_images),
                      "--n-triplets", str(args.n_triplets)]
        run_cli(["make-fixture", "--dataset", args.dataset, "--out", root,
                 *sizing]
                + (["--learnable"] if args.learnable else []),
                env, "fixture")
        bank("fixture")

    # 2. untrained baseline eval — same init seed as the train leg so the
    # frozen towers are IDENTICAL and the trained-vs-untrained delta is
    # purely the fusion subtree (the trained legs below resolve the same
    # seed automatically from the best ckpt's .meta.json sidecar)
    if "base_recalls" not in stages:
        base_recalls, _ = run_cli(
            ["eval", *common, "--batch-size", "32", "--split", "val",
             "--seed", "7", "--json"], env, "baseline eval", capture_json=True)
        bank("base_recalls", base_recalls)
    base_recalls = stages["base_recalls"]
    print("[soak] untrained:", json.dumps(base_recalls), flush=True)

    # 3. train with per-epoch validation + best-ckpt selection
    log_path = os.path.join(args.work, "train.jsonl")
    if "train_s" not in stages:
        _, train_s = run_cli(
            ["train", *common, "--batch-size", str(args.batch),
             "--num-epochs", str(args.epochs), "--validation-frequency", "1",
             "--validation-bs", "32", "--image-dtype", "uint8",
             "--ckpt-dir", ck, "--print-frequency", "5",
             "--log-path", log_path, "--seed", "7"]
            + (["--validate-200k"] if args.dataset == "fashion200k" else []),
            env, "train", clean=(log_path,))
        bank("train_s", train_s)
    train_s = stages["train_s"]
    best_path = os.path.join(ck, f"{args.dataset}-best")
    recs = [json.loads(l) for l in open(log_path)]
    steps = max(r.get("step", 0) for r in recs)
    val_curve = [(r["step"], r["val_metric"]) for r in recs if "val_metric" in r]
    best_metric = max(m for _, m in val_curve)
    print(f"[soak] {steps} steps, val curve: {val_curve}", flush=True)

    # 4. trained eval through the CLI with the selected checkpoint
    if "trained_recalls" not in stages:
        trained_recalls, _ = run_cli(
            ["eval", *common, "--batch-size", "32", "--split", "val",
             "--fusion-model-path", best_path, "--json"],
            env, "trained eval", capture_json=True)
        bank("trained_recalls", trained_recalls)
    trained_recalls = stages["trained_recalls"]
    print("[soak] trained:", json.dumps(trained_recalls), flush=True)

    # 5. export the artifact from the same checkpoint
    if "export" not in stages:
        run_cli(["export", *common, "--batch-size", "32", "--split", "val",
                 "--fusion-model-path", best_path, "--out", art],
                env, "export")
        bank("export")

    # 6. live service vs artifact: identical answers, equal recalls
    os.environ["FASHIONERN_BPE_PATH"] = bpe
    sys.path.insert(0, REPO)
    from fashionern_aaai2024_tpu.cli.main import build_parser, build_service
    from fashionern_aaai2024_tpu.retrieval.artifact import load_serve_artifact

    sargs = build_parser().parse_args(
        ["serve", *common, "--batch-size", "32", "--split", "val",
         "--fusion-model-path", best_path])
    service = build_service(sargs)
    artifact = load_serve_artifact(art)
    assert artifact.names == service.gallery.names, \
        "artifact gallery order != live service gallery order"

    queries = iter_queries(args.dataset, root)
    k = 10
    hits_live = hits_art = 0
    mismatched = 0
    for ref, cap, tar in queries:
        live, _lat = service.query([ref], [cap], k=k)
        live_names = [d["name"] for d in live[0]]
        ids = service.api.tokenize([cap])
        row = np.asarray([artifact.row_for(ref)], np.int32)
        _, idx = artifact.query(ids, row, k=k)
        art_names = [artifact.names[j] for j in idx[0]]
        if live_names != art_names:
            mismatched += 1
            print(f"[soak] MISMATCH ref={ref}: live={live_names[:3]} "
                  f"art={art_names[:3]}", flush=True)
        hits_live += tar in live_names
        hits_art += tar in art_names
    r_live = 100.0 * hits_live / len(queries)
    r_art = 100.0 * hits_art / len(queries)

    summary = {
        "dataset": args.dataset,
        "model": args.model,
        "tme": args.tme,
        "fixture": {"n_images_per_type": args.n_images,
                    "n_triplets_per_type_split": args.n_triplets,
                    "learnable": args.learnable},
        "train": {"steps": steps, "epochs": args.epochs,
                  "batch": args.batch, "wall_s": round(train_s, 1),
                  "val_curve": val_curve, "best_metric": best_metric},
        "untrained_eval": base_recalls,
        "trained_eval": trained_recalls,
        "combined_gallery_recall_at10": {"live_service": r_live,
                                         "artifact": r_art},
        "queries": len(queries),
        "live_vs_artifact_topk_mismatches": mismatched,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    assert mismatched == 0, "artifact answers diverge from live service"
    assert r_live == r_art
    assert trained_recalls[mkey] > base_recalls[mkey], \
        "training did not improve the selection metric over random init"
    print(f"[soak] OK: {steps} steps, eval {mkey} {base_recalls[mkey]:.1f} → "
          f"{trained_recalls[mkey]:.1f}, artifact == live on "
          f"{len(queries)} queries (R@10 {r_art:.1f})")


if __name__ == "__main__":
    main()
