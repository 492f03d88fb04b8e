"""`fashionern` CLI: train / eval / info.

Replaces the reference's ten per-dataset `__main__` scripts
(`run/train/train_*.py`, `run/test/test_*.py`) with two subcommands;
flag names mirror the reference argparse blocks
(`run/train/train_fiq.py:181-205`, `run/test/test_fiq.py:125-137`) so
recipes translate 1:1. Deliberate differences:
  * `--data-root` replaces hardcoded `/mnt/...` paths (reference
    defect SURVEY §2.9.11);
  * no `torch.distributed.launch` — one process drives the whole mesh
    (`jax.distributed` handles multi-host when present);
  * checkpoints may be PyTorch `.pth` (auto-converted) or Orbax dirs.
"""

from __future__ import annotations

import argparse
import json
import sys


def _backbones() -> list:
    from fashionern_aaai2024_tpu.models.clip.config import _CONFIGS

    return sorted(_CONFIGS)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", default="fashioniq",
                   choices=["fashioniq", "fashioniq-val", "cirr", "shoes", "fashion200k"])
    p.add_argument("--data-root", required=True,
                   help="Dataset root directory (replaces the reference's hardcoded paths)")
    p.add_argument("--clip-model-name", default="RN50x4", choices=_backbones())
    p.add_argument("--patch-num", default=13, type=int)
    p.add_argument("--num-workers", default=4, type=int)
    p.add_argument("--worker-type", default="thread", choices=["thread", "process"],
                   help="'process' = fork workers (reference DataLoader model), "
                        "for decode-bound datasets")
    p.add_argument("--target-ratio", default=1.25, type=float)
    p.add_argument("--transform", default="targetpad",
                   choices=["targetpad", "squarepad", "none"])
    p.add_argument("--image-dtype", default="float32",
                   choices=["float32", "uint8"],
                   help="'uint8' feeds raw pixels and normalizes on device "
                        "(4x less host->device transfer; ~1-ulp feature delta)")
    p.add_argument("--bpe-path", default=None,
                   help="Path to open_clip's bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--tme", action="store_true",
                   help="TME text enhancement: a trainable cross-attention "
                        "module (ERN subtree, models/ern/tme.py) conditions "
                        "text encoding on the reference patches — the "
                        "reconstruction of the reference's closed-source "
                        "fork surface (README.md:41). Zero-init: training "
                        "starts at the vanilla function. Pass the SAME flag "
                        "to train/eval/serve/export so checkpoints match")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="fashionern")
    sub = parser.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="fine-tune the ERN fusion stack")
    _add_common(t)
    t.add_argument("--lr", default=4e-5, type=float)
    t.add_argument("--batch-size", default=1024, type=int,
                   help="per-shard batch (reference: per-rank)")
    t.add_argument("--num-epochs", default=300, type=int)
    t.add_argument("--validation-frequency", default=3, type=int)
    t.add_argument("--print-frequency", default=100, type=int)
    t.add_argument("--validation-bs", default=32, type=int)
    t.add_argument("--clip-model-path", default=None,
                   help="fine-tuned CLIP checkpoint (.pth with 'CLIP' key, or raw state dict)")
    t.add_argument("--ckpt-dir", default="ckpt")
    t.add_argument("--seed", default=42, type=int)
    t.add_argument("--negatives", default="local", choices=["local", "global"],
                   help="'local' = per-shard in-batch negatives (reference DDP parity)")
    t.add_argument("--log-path", default=None)
    t.add_argument("--max-steps-per-epoch", default=None, type=int)
    t.add_argument("--resume", default=None,
                   help="Orbax train-state dir from a previous run "
                        "(written as <ckpt-dir>/<dataset>-resume)")
    t.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of steady-state steps here")
    t.add_argument("--precision", default="fp32", choices=["fp32", "bf16"],
                   help="bf16 runs the frozen CLIP towers in bf16 (fusion stays fp32)")
    t.add_argument("--cache-features", action="store_true",
                   help="pre-encode unique train images once (CLIP is frozen); "
                        "per-step image towers become lookups, text stays online")
    t.add_argument("--quantize-towers", action="store_true",
                   help="int8 frozen-tower MLP kernels in the train step — "
                        "the fallback when the image set outruns "
                        "--cache-features (the full step is ~80%% frozen-"
                        "tower forward; towers are stop_gradient'd so the "
                        "inference int8 path is legal; ~1%% tower-feature "
                        "numerics change, same trade as eval)")
    t.add_argument("--prefetch", default=2, type=int,
                   help="host→device prefetch depth: decode+tokenize+H2D "
                        "run a background thread this many batches ahead "
                        "of the step (0 = serial feed; numerics identical "
                        "either way — batches are keyed by step id)")
    t.add_argument("--validate-200k", action="store_true",
                   help="opt-in in-training validation for fashion200k "
                        "(multi-positive test-split eval per validation "
                        "epoch + best-ckpt selection; the reference skips "
                        "it for gallery size, base_trainer.py:50-53)")

    e = sub.add_parser("eval", help="run a retrieval benchmark")
    _add_common(e)
    e.add_argument("--clip-path", default=None,
                   help="fine-tuned CLIP checkpoint (reference saved_state_dict['CLIP'])")
    e.add_argument("--fusion-model-path", default=None,
                   help="fusion (ERN) checkpoint: torch .pth or Orbax dir")
    e.add_argument("--seed", default=None, type=int,
                   help="init seed for random-init model parts (default: "
                        "the fusion ckpt's recorded train-init seed, "
                        "else 42)")
    e.add_argument("--batch-size", default=32, type=int)
    e.add_argument("--split", default="val")
    e.add_argument("--json", action="store_true", help="print metrics as one JSON line")
    e.add_argument("--submission-dir", default=None,
                   help="CIRR test1: write recall_submission.json + "
                        "recall_subset_submission.json here instead of metrics")
    e.add_argument("--data-parallel", action="store_true",
                   help="shard eval batches over all devices (DP mesh over ICI)")
    e.add_argument("--quantize-gallery", action="store_true",
                   help="int8 gallery for the top-k search (4x less HBM)")
    e.add_argument("--quantize-towers", action="store_true",
                   help="int8 tower projections — MLP matmuls AND the "
                        "attention qkv/out projections (attention math "
                        "stays bf16); 2x MXU rate on v5e, dynamic "
                        "symmetric quant, same checkpoints")
    e.add_argument("--fold-bn", action="store_true",
                   help="fold frozen BatchNorm into RN conv kernels at "
                        "weight load (numerics-identical; measured "
                        "perf-neutral on v5e — XLA fuses the affine)")
    e.add_argument("--topk-recall", default=None, type=float,
                   metavar="R",
                   help="switch every gallery-wide top-k to the TPU "
                        "approx_max_k selector at recall target R "
                        "(e.g. 0.95 -> measured 9x search q/s at "
                        "N=200k, per-query recall 0.984; exact "
                        "lax.top_k when omitted)")
    e.add_argument("--precision", default="fp32", choices=["fp32", "bf16"],
                   help="tower/fusion weight+activation dtype (bf16 is the "
                        "production serving dtype: MXU-native, recalls "
                        "measured identical on the rehearsal fixtures)")

    sv = sub.add_parser("serve",
                        help="persistent retrieval service: embed+refine the "
                             "gallery once, answer composed queries over HTTP")
    _add_common(sv)
    sv.add_argument("--clip-path", default=None)
    sv.add_argument("--fusion-model-path", default=None)
    sv.add_argument("--seed", default=None, type=int)
    sv.add_argument("--batch-size", default=32, type=int)
    sv.add_argument("--split", default="val")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", default=8080, type=int)
    sv.add_argument("--quantize-gallery", action="store_true")
    sv.add_argument("--quantize-refs", action="store_true",
                    help="int8 reference feature/patch rows in the serve "
                         "program (~4x on the dominant serving-HBM term "
                         "and on the export consts sidecar; ~0.4%% extra "
                         "quant error on DVR inputs)")
    sv.add_argument("--quantize-towers", action="store_true")
    sv.add_argument("--topk-recall", default=None, type=float, metavar="R",
                    help="approx top-k selector at recall target R "
                         "(serving tier; exact when omitted)")
    sv.add_argument("--fold-bn", action="store_true")
    sv.add_argument("--data-parallel", action="store_true")
    sv.add_argument("--precision", default="bf16", choices=["fp32", "bf16"],
                   help="serving dtype (default bf16: MXU-native)")
    sv.add_argument("--capacity", default=None, type=int,
                    help="pre-allocate gallery rows for LIVE additions "
                         "(POST /add embeds + serves new items with "
                         "zero recompiles; default: fixed gallery)")
    sv.add_argument("--no-dynamic-batching", action="store_true",
                    help="disable coalescing of concurrent single queries "
                         "into shared dispatches (on by default)")
    sv.add_argument("--native-front", action="store_true",
                    help="serve /query through the C++ epoll front-end "
                         "(native/fastserve.cpp): HTTP+JSON parse, BPE "
                         "tokenize, and micro-batching all run GIL-free; "
                         "Python keeps only the jitted dispatch. Admin "
                         "endpoints (/add, /reload) stay on a Python "
                         "server at --admin-port")
    sv.add_argument("--admin-port", default=None, type=int,
                    help="port for the Python admin server when "
                         "--native-front is set (default: port+1)")

    ex = sub.add_parser(
        "export",
        help="AOT-export the one-dispatch serve program (weights + "
             "embedded gallery ship in a swappable consts sidecar fed "
             "to the programs as arguments) — a serving host needs jax "
             "+ the artifact dir, none of the model code (reference "
             "deploys by re-importing the whole repo per "
             "run/test/test_fiq.py)")
    _add_common(ex)
    ex.add_argument("--clip-path", default=None)
    ex.add_argument("--fusion-model-path", default=None)
    ex.add_argument("--seed", default=None, type=int)
    ex.add_argument("--batch-size", default=32, type=int)
    ex.add_argument("--split", default="val")
    ex.add_argument("--out", required=True, help="artifact directory")
    ex.add_argument("--quantize-gallery", action="store_true")
    ex.add_argument("--quantize-refs", action="store_true",
                    help="int8 ref rows: ~4x smaller consts sidecar")
    ex.add_argument("--quantize-towers", action="store_true")
    ex.add_argument("--topk-recall", default=None, type=float, metavar="R",
                    help="approx top-k selector baked into the exported "
                         "serve programs (exact when omitted)")
    ex.add_argument("--fold-bn", action="store_true")
    ex.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])

    rf = sub.add_parser(
        "refresh-artifact",
        help="republish an artifact's consts sidecar (weights + "
             "gallery) from a retrained checkpoint WITHOUT re-exporting "
             "the programs; optionally POST /reload to a running "
             "serve-artifact daemon so it picks the blob up live")
    _add_common(rf)
    rf.add_argument("--clip-path", default=None)
    rf.add_argument("--fusion-model-path", default=None)
    rf.add_argument("--seed", default=None, type=int)
    rf.add_argument("--batch-size", default=32, type=int)
    rf.add_argument("--split", default="val")
    rf.add_argument("--artifact", required=True, help="artifact directory "
                    "produced by `fashionern export`")
    rf.add_argument("--quantize-gallery", action="store_true")
    rf.add_argument("--quantize-refs", action="store_true",
                    help="must match the exported artifact's flag — the "
                         "consts tree structure differs")
    rf.add_argument("--quantize-towers", action="store_true")
    rf.add_argument("--topk-recall", default=None, type=float, metavar="R")
    rf.add_argument("--fold-bn", action="store_true")
    rf.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    rf.add_argument("--reload-url", default=None,
                    help="base URL of a running serve-artifact daemon "
                         "(e.g. http://127.0.0.1:8080) to POST /reload "
                         "after republishing")

    sa = sub.add_parser(
        "serve-artifact",
        help="serve an AOT-exported artifact over HTTP — the host needs "
             "jax + the artifact dir only (no model code, checkpoint, "
             "or dataset flags; tokenization is the vendored pure-"
             "Python BPE)")
    sa.add_argument("--artifact", required=True, help="artifact directory "
                    "produced by `fashionern export`")
    sa.add_argument("--host", default="127.0.0.1")
    sa.add_argument("--port", default=8080, type=int)
    sa.add_argument("--no-dynamic-batching", action="store_true")
    sa.add_argument("--allow-platform-mismatch", action="store_true",
                    help="load an artifact exported for a different "
                         "backend (numerics may differ; see manifest)")
    sa.add_argument("--bpe-path", default=None,
                    help="BPE merges table for the server-side tokenizer")

    sub.add_parser("info", help="print registered backbones/datasets/losses")

    x = sub.add_parser("extract-patches",
                       help="offline 13-crop patch features (batched TPU)")
    x.add_argument("--data-root", required=True)
    x.add_argument("--dataset", default="fashioniq",
                   choices=["fashioniq", "cirr", "shoes", "fashion200k"])
    x.add_argument("--clip-model-name", default="RN50x4", choices=_backbones())
    x.add_argument("--clip-path", default=None,
                   help="fine-tuned CLIP checkpoint for the crop encoder")
    x.add_argument("--out-dir", required=True)
    x.add_argument("--image-dir", default="images")
    x.add_argument("--batch-images", default=16, type=int)
    x.add_argument("--target-ratio", default=1.25, type=float)
    x.add_argument("--no-pack", action="store_true")

    cp = sub.add_parser("convert-patches", help=".pth patch dumps → .npy + pack")
    cp.add_argument("--src", required=True)
    cp.add_argument("--dst", default=None)
    cp.add_argument("--pack-only", action="store_true",
                    help="only rebuild pack.npy from existing .npy files")

    mf = sub.add_parser("make-fixture",
                        help="write a tiny synthetic on-disk dataset in the "
                             "exact real layout (smoke tests / dress rehearsal)")
    mf.add_argument("--dataset", required=True,
                    choices=["fashioniq", "cirr", "shoes", "fashion200k"])
    mf.add_argument("--out", required=True)
    mf.add_argument("--dim", default=512, type=int,
                    help="patch feature dim (512 ViT-B-16 / 640 RN50x4)")
    mf.add_argument("--patch-num", default=13, type=int)
    mf.add_argument("--seed", default=0, type=int)
    mf.add_argument("--n-images", default=None, type=int,
                    help="per-type image universe size (default: tiny "
                         "plumbing fixture; accuracy soak uses larger)")
    mf.add_argument("--n-triplets", default=None, type=int,
                    help="per-type per-split triplet count")
    mf.add_argument("--n-per-color", default=None, type=int,
                    help="fashion200k only: images per (color,style) class "
                         "per split (gallery scale knob)")
    mf.add_argument("--n-queries", default=None, type=int,
                    help="fashion200k only: test_queries.txt size")
    mf.add_argument("--learnable", action="store_true",
                    help="images carry visible (color, pattern) attributes "
                         "and captions describe the target's — held-out "
                         "queries become genuinely learnable "
                         "(fashioniq/cirr/shoes)")

    fb = sub.add_parser("fetch-bpe",
                        help="download + hash-verify the CLIP BPE merges table "
                             "into the package data dir (one-time setup)")
    fb.add_argument("--dest-dir", default=None,
                    help="install directory (default: models/clip/data/)")

    cc = sub.add_parser("convert-ckpt", help="torch checkpoint → Orbax params")
    cc.add_argument("--src", required=True)
    cc.add_argument("--out", required=True)
    cc.add_argument("--kind", required=True, choices=["clip", "ern"])
    cc.add_argument("--clip-model-name", default="RN50x4", choices=_backbones())
    return parser


def _load_torch_state_dict(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "CLIP" in sd:
        sd = sd["CLIP"]
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def load_model_variables(clip_cfg, clip_path: str | None, fusion_path: str | None,
                         patch_num: int, seed: int | None = None) -> dict:
    """Assemble composed-model variables from (optionally converted)
    checkpoints; random init for whatever is missing.

    Seed resolution for the random-init parts: explicit `seed` arg >
    the best-checkpoint's `.meta.json` sidecar (written by the Trainer:
    the init seed the fusion subtree was actually trained against) >
    42. With random-init CLIP towers (no `clip_path` — fixture/test
    world) this matters: a trained ERN evaluated against towers from a
    DIFFERENT init seed returns noise-level recalls."""
    import os
    import warnings

    import jax
    import numpy as np

    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel, merge_variables

    meta = {}
    if fusion_path and not fusion_path.endswith((".pth", ".pt", ".bin")):
        meta_path = fusion_path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
    if seed is None:
        seed = meta.get("init_seed", 42) if clip_path is None else 42
    if clip_path is None and meta.get("clip_from_checkpoint"):
        warnings.warn(
            "fusion checkpoint was trained against CLIP weights loaded "
            "from a checkpoint, but no --clip-model-path was given — "
            "evaluating it against random-init towers returns garbage",
            stacklevel=2)
    if "tme" in meta and bool(meta["tme"]) != bool(clip_cfg.text.tme):
        warnings.warn(
            f"fusion checkpoint was trained with tme={meta['tme']} but the "
            f"model is built with tme={clip_cfg.text.tme} — pass the same "
            "--tme flag the training run used (the ERN param trees differ)",
            stacklevel=2)

    model = ComposedCIRModel(clip_cfg, patch_num=patch_num)
    rng = jax.random.PRNGKey(seed)
    v = clip_cfg.vision
    init = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, clip_cfg.text.context_length), np.int32),
        np.zeros((2, patch_num, clip_cfg.feature_dim), np.float32),
        np.zeros((2, patch_num, clip_cfg.feature_dim), np.float32),
        deterministic=False, method=model.train_forward,
    )
    clip_vars = {"params": init["params"]["clip"]}
    if "batch_stats" in init and "clip" in init["batch_stats"]:
        clip_vars["batch_stats"] = init["batch_stats"]["clip"]
    ern_vars = {"params": init["params"]["ern"]}
    if "batch_stats" in init and "ern" in init["batch_stats"]:
        ern_vars["batch_stats"] = init["batch_stats"]["ern"]

    if clip_path:
        from fashionern_aaai2024_tpu.models.clip.convert import clip_variables_from_torch

        clip_vars = clip_variables_from_torch(_load_torch_state_dict(clip_path), clip_cfg)
    if fusion_path:
        if fusion_path.endswith((".pth", ".pt", ".bin")):
            from fashionern_aaai2024_tpu.models.ern.convert import ern_variables_from_torch

            ern_vars = ern_variables_from_torch(_load_torch_state_dict(fusion_path))
        else:
            from fashionern_aaai2024_tpu.train.checkpoint import restore_params

            # Orbax dirs hold either the full ERN variables tree (from
            # `convert-ckpt` / best-checkpoint saves) or bare params
            # (legacy); keep the init BN stats when the save lacks them
            restored = restore_params(fusion_path)
            if "params" not in restored:
                restored = {"params": restored}
            if "batch_stats" not in restored and "batch_stats" in ern_vars:
                restored["batch_stats"] = ern_vars["batch_stats"]
            ern_vars = restored
    return model, merge_variables(clip_vars, ern_vars)


def _pad_mode(transform: str) -> str:
    return {"targetpad": "target", "squarepad": "square", "none": "none"}[transform]


def run_eval(args) -> dict:
    from fashionern_aaai2024_tpu.data.loader import Loader
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.retrieval import evaluate as E

    if args.bpe_path:
        import os

        os.environ["FASHIONERN_BPE_PATH"] = args.bpe_path

    clip_cfg = get_clip_config(
        args.clip_model_name,
        quantize_mlp=True if getattr(args, "quantize_towers", False) else None,
        tme=True if getattr(args, "tme", False) else None,
    )
    model, variables = load_model_variables(
        clip_cfg, args.clip_path, args.fusion_model_path, args.patch_num,
        seed=getattr(args, "seed", None),
    )
    if getattr(args, "fold_bn", False):
        from fashionern_aaai2024_tpu.models.clip.resnet import fold_batchnorm

        variables = fold_batchnorm(variables)
    variables = _cast_precision(variables, getattr(args, "precision", "fp32"))
    mesh = None
    if getattr(args, "data_parallel", False):
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
    api = E.InferenceAPI(model, variables, batch_size=args.batch_size,
                         context_length=clip_cfg.text.context_length, mesh=mesh,
                         quantize_gallery=getattr(args, "quantize_gallery", False),
                         approx_recall=getattr(args, "topk_recall", None))
    dim = clip_cfg.input_dim
    pad = _pad_mode(args.transform)
    mk = dict(dim=dim, pad_mode=pad, target_ratio=args.target_ratio,
              image_dtype=getattr(args, "image_dtype", "float32"))

    def loader(ds):
        return Loader(ds, args.batch_size, num_workers=args.num_workers,
                      worker_type=getattr(args, "worker_type", "thread"))

    if args.dataset in ("fashioniq", "fashioniq-val"):
        from fashionern_aaai2024_tpu.data.fashioniq import FashionIQDataset

        val_protocol = args.dataset == "fashioniq-val"
        loaders = {}
        for dt in ("dress", "shirt", "toptee"):
            classic = FashionIQDataset(args.data_root, args.split, [dt], mode="classic",
                                       val_protocol=val_protocol, **mk)
            relative = FashionIQDataset(args.data_root, args.split, [dt], mode="relative",
                                        **mk)
            loaders[dt] = (loader(classic), loader(relative))
        if val_protocol:
            out = {}
            for dt, (c, r) in loaders.items():
                out[dt] = E.evaluate_fiq_split(
                    api, c, r, ks=(1, 5, 10, 15, 20, 30, 40, 50)
                )
            return out
        return E.evaluate_fiq(api, loaders)
    if args.dataset == "cirr":
        from fashionern_aaai2024_tpu.data.cirr import CIRRDataset

        classic = loader(CIRRDataset(args.data_root, args.split, mode="classic", **mk))
        relative = loader(CIRRDataset(args.data_root, args.split, mode="relative", **mk))
        if args.split == "test1":
            import os

            out_dir = args.submission_dir or "cirr_submission"
            payloads = E.generate_cirr_submission(api, classic, relative)
            os.makedirs(out_dir, exist_ok=True)
            written = {}
            for name, payload in payloads.items():
                path = os.path.join(out_dir, f"{name}.json")
                with open(path, "w") as f:
                    json.dump(payload, f)
                written[name] = path
            return written
        return E.evaluate_cirr(api, classic, relative)
    if args.dataset == "shoes":
        from fashionern_aaai2024_tpu.data.shoes import ShoesDataset

        return E.evaluate_shoes(
            api,
            loader(ShoesDataset(args.data_root, args.split, mode="classic", **mk)),
            loader(ShoesDataset(args.data_root, args.split, mode="relative", **mk)),
        )
    # fashion200k ("val" is the FIQ/CIRR-flavored default; the reference
    # evaluates its test split, run/test/test_200k.py:116-193)
    from fashionern_aaai2024_tpu.data.fashion200k import (
        Fashion200kTestDataset, Fashion200kTestQueryDataset,
    )

    split_200k = "test" if args.split == "val" else args.split
    return E.evaluate_fashion200k(
        api,
        loader(Fashion200kTestDataset(args.data_root, split=split_200k, **mk)),
        loader(Fashion200kTestQueryDataset(args.data_root, split=split_200k, **mk)),
    )


def make_classic_loader(args):
    """The gallery-side (classic-mode) dataset + loader for a dataset
    choice — shared by `eval` internals and `serve`."""
    from fashionern_aaai2024_tpu.data.loader import Loader
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config

    dim = get_clip_config(args.clip_model_name).input_dim
    pad = _pad_mode(args.transform)
    mk = dict(dim=dim, pad_mode=pad, target_ratio=args.target_ratio,
              image_dtype=getattr(args, "image_dtype", "float32"))
    if args.dataset in ("fashioniq", "fashioniq-val"):
        from fashionern_aaai2024_tpu.data.fashioniq import FashionIQDataset

        ds = FashionIQDataset(args.data_root, args.split,
                              ["dress", "shirt", "toptee"], mode="classic",
                              val_protocol=args.dataset == "fashioniq-val", **mk)
    elif args.dataset == "cirr":
        from fashionern_aaai2024_tpu.data.cirr import CIRRDataset

        ds = CIRRDataset(args.data_root, args.split, mode="classic", **mk)
    elif args.dataset == "shoes":
        from fashionern_aaai2024_tpu.data.shoes import ShoesDataset

        ds = ShoesDataset(args.data_root, args.split, mode="classic", **mk)
    else:
        from fashionern_aaai2024_tpu.data.fashion200k import Fashion200kTestDataset

        ds = Fashion200kTestDataset(args.data_root, split=args.split, **mk)
    return Loader(ds, args.batch_size, num_workers=args.num_workers,
                  worker_type=getattr(args, "worker_type", "thread"))


def _cast_precision(variables: dict, precision: str) -> dict:
    """bf16 is the production inference dtype (MXU-native; retrieval
    similarity still accumulates fp32 downstream). Float leaves only —
    int/bool leaves (e.g. BN counters) keep their dtype."""
    if precision == "fp32":
        return variables
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        variables)


def build_service(args):
    """Model + gallery + RetrievalService from serve-CLI args (separate
    from `run_serve` so tests can drive the wiring without
    serve_forever)."""
    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.retrieval import evaluate as E
    from fashionern_aaai2024_tpu.retrieval.server import RetrievalService

    if args.bpe_path:
        import os

        os.environ["FASHIONERN_BPE_PATH"] = args.bpe_path
    clip_cfg = get_clip_config(
        args.clip_model_name,
        quantize_mlp=True if args.quantize_towers else None,
        tme=True if getattr(args, "tme", False) else None,
    )
    model, variables = load_model_variables(
        clip_cfg, args.clip_path, args.fusion_model_path, args.patch_num,
        seed=getattr(args, "seed", None))
    if getattr(args, "fold_bn", False):
        from fashionern_aaai2024_tpu.models.clip.resnet import fold_batchnorm

        variables = fold_batchnorm(variables)
    variables = _cast_precision(variables, getattr(args, "precision", "bf16"))
    mesh = None
    if getattr(args, "data_parallel", False):
        from fashionern_aaai2024_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
    api = E.InferenceAPI(model, variables, batch_size=args.batch_size,
                         context_length=clip_cfg.text.context_length,
                         mesh=mesh, quantize_gallery=args.quantize_gallery,
                         quantize_refs=getattr(args, "quantize_refs", False),
                         approx_recall=getattr(args, "topk_recall", None))
    print(f"embedding gallery ({args.dataset}/{args.split}) ...", flush=True)
    spec = dict(dim=clip_cfg.input_dim, pad_mode=_pad_mode(args.transform),
                target_ratio=args.target_ratio,
                image_dtype=getattr(args, "image_dtype", "float32"))
    return RetrievalService(api, make_classic_loader(args),
                            capacity=getattr(args, "capacity", None),
                            image_spec=spec, add_root=args.data_root)


def run_export(args) -> dict:
    """`fashionern export`: AOT serving artifact (retrieval/artifact.py).

    Builds the same gallery-resident service as `serve`, then
    serializes its one-dispatch program, weights + gallery in the
    swappable consts sidecar (see retrieval/artifact.py).
    """
    from fashionern_aaai2024_tpu.retrieval.artifact import export_serve_artifact

    service = build_service(args)
    return export_serve_artifact(
        service._serve_fn, args.out,
        model_name=args.clip_model_name,
        gallery_names=service.gallery.names,
        extra_meta={"dataset": args.dataset, "split": args.split,
                    "precision": getattr(args, "precision", "bf16")})


def run_serve(args) -> None:
    from fashionern_aaai2024_tpu.retrieval.server import serve

    service = build_service(args)
    mesh = getattr(service._serve_fn, "mesh", None)
    shard_note = (f", gallery sharded over {mesh.devices.size} devices"
                  if mesh is not None else "")
    if getattr(args, "native_front", False):
        from fashionern_aaai2024_tpu.native import serve_frontend as SF

        if not SF.available():
            print("native front-end unavailable (build failed); falling "
                  "back to the Python HTTP server", flush=True)
        else:
            ns = SF.serve_native(service, host=args.host, port=args.port)
            admin_port = (args.admin_port if args.admin_port is not None
                          else args.port + 1)
            httpd = serve(service, host=args.host, port=admin_port,
                          dynamic_batching=not args.no_dynamic_batching)
            print(f"serving {service.gallery_size} gallery items on "
                  f"http://{args.host}:{ns.port} (native front; admin "
                  f"/add /reload on "
                  f"http://{args.host}:{httpd.server_address[1]}; "
                  f"startup {service.startup_seconds:.1f}s{shard_note})",
                  flush=True)
            t = __import__("threading").Thread(
                target=httpd.serve_forever, daemon=True)
            t.start()
            try:
                ns.wait()
            except KeyboardInterrupt:
                ns.shutdown()
            return
    httpd = serve(service, host=args.host, port=args.port,
                  dynamic_batching=not args.no_dynamic_batching)
    print(f"serving {service.gallery_size} gallery items on "
          f"http://{args.host}:{httpd.server_address[1]} "
          f"(startup {service.startup_seconds:.1f}s{shard_note})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


def run_refresh_artifact(args) -> dict:
    """`fashionern refresh-artifact`: rebuild the service from the
    (retrained) checkpoint flags, republish the artifact's consts
    sidecar in place, and optionally tell a running daemon to reload."""
    from fashionern_aaai2024_tpu.retrieval.artifact import refresh_consts

    service = build_service(args)
    manifest = refresh_consts(args.artifact, service._serve_fn)
    print(f"republished consts for {manifest['gallery_size']}-item "
          f"gallery at {args.artifact}", flush=True)
    if args.reload_url:
        import urllib.request

        req = urllib.request.Request(
            args.reload_url.rstrip("/") + "/reload", b"{}",
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            print("daemon reload:", r.read().decode(), flush=True)
    return manifest


def run_serve_artifact(args) -> None:
    """`fashionern serve-artifact`: HTTP daemon over an AOT artifact.

    The deploy-host entry point: none of the model stack imports, so it
    works on a host that has only jax + this package's retrieval/ and
    tokenizer modules + the artifact directory.
    """
    from fashionern_aaai2024_tpu.retrieval.server import ArtifactService, serve

    if args.bpe_path:
        import os

        os.environ["FASHIONERN_BPE_PATH"] = args.bpe_path
    service = ArtifactService(
        args.artifact,
        allow_platform_mismatch=args.allow_platform_mismatch)
    httpd = serve(service, host=args.host, port=args.port,
                  dynamic_batching=not args.no_dynamic_batching)
    print(f"serving {service.gallery_size} gallery items from artifact "
          f"{args.artifact} on http://{args.host}:{httpd.server_address[1]} "
          f"(startup {service.startup_seconds:.1f}s)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


def run_train(args) -> None:
    from fashionern_aaai2024_tpu.train.trainer import TrainConfig, Trainer

    if args.bpe_path:
        import os

        os.environ["FASHIONERN_BPE_PATH"] = args.bpe_path

    dataset = "fashioniq" if args.dataset == "fashioniq-val" else args.dataset
    cfg = TrainConfig(
        dataset=dataset,
        data_root=args.data_root,
        clip_model_name=args.clip_model_name,
        batch_size=args.batch_size,
        lr=args.lr,
        num_epochs=args.num_epochs,
        validation_frequency=args.validation_frequency,
        print_frequency=args.print_frequency,
        ckpt_dir=args.ckpt_dir,
        seed=args.seed,
        target_ratio=args.target_ratio,
        patch_num=args.patch_num,
        num_workers=args.num_workers,
        worker_type=getattr(args, "worker_type", "thread"),
        negatives=args.negatives,
        eval_batch_size=args.validation_bs,
        log_path=args.log_path,
        max_steps_per_epoch=args.max_steps_per_epoch,
        resume_path=args.resume,
        profile_dir=args.profile_dir,
        precision=args.precision,
        cache_features=getattr(args, "cache_features", False),
        quantize_towers=getattr(args, "quantize_towers", False),
        image_dtype=getattr(args, "image_dtype", "float32"),
        prefetch_batches=getattr(args, "prefetch", 2),
        validate_200k=getattr(args, "validate_200k", False),
        tme=getattr(args, "tme", False),
    )
    trainer = Trainer(cfg)
    if args.clip_model_path:
        trainer.load_clip_checkpoint(_load_torch_state_dict(args.clip_model_path))
    trainer.train()
    trainer.save_resume_checkpoint()


def run_info() -> dict:
    from fashionern_aaai2024_tpu import __version__, native
    from fashionern_aaai2024_tpu.native import image as native_image
    from fashionern_aaai2024_tpu.native import tokenizer as native_tokenizer
    from fashionern_aaai2024_tpu.models.clip.config import _CONFIGS
    from fashionern_aaai2024_tpu.models.zoo import _ZOO
    from fashionern_aaai2024_tpu.ops.extra_losses import LOSS_REGISTRY
    from fashionern_aaai2024_tpu.train.trainer import PLUGINS

    from fashionern_aaai2024_tpu.ops.common import use_pallas

    info = {
        "version": __version__,
        "backbones": sorted(_CONFIGS),
        "datasets": sorted(PLUGINS),
        "losses": sorted(LOSS_REGISTRY),
        "zoo_models": sorted(_ZOO),
        "native_loader": native.available(),
        "native_image": native_image.available(),
        "native_tokenizer": native_tokenizer.available(),
        "topk_tiers": {
            "exact": "lax.top_k (default; parity tier)",
            "approx": "--topk-recall R -> lax.approx_max_k (TPU hardware "
                      "reduction; 8.6x search q/s at N=200k, r3 ledger)",
        },
        # kernel dispatch summary (ops/attention.py, BASELINE.md ledger)
        "pallas_kernels": {
            "enabled": use_pallas(),
            "self_attention_bf16": "whole-sub-block kernel (LN+qkv+attn+out_proj+residual)",
            "self_attention_fp32": "packed-QKV kernel (bit-exact vs XLA on-chip)",
            "mlp_bf16": "MLP-sub-block kernel (LN+c_fc+act+c_proj+residual, r3)",
            "whole_block": "built; measured tie vs sub-block pair — dispatch declined (r3 ledger)",
            "fusion_and_cross_attention": "XLA by measurement (r3 ledger)",
            "bbc_loss": "fused forward + custom VJP",
            "int8_mlp_serving": "--quantize-towers",
            "kill_switch": "FASHIONERN_NO_PALLAS=1",
        },
    }
    try:
        import jax

        info["backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # no accelerator runtime configured
        info["backend"] = f"unavailable ({type(e).__name__})"
    return info


def run_extract_patches(args) -> int:
    import jax

    from fashionern_aaai2024_tpu.models.clip.config import get_clip_config
    from fashionern_aaai2024_tpu.tools.extract_patches import (
        PatchExtractor, enumerate_fashion200k, enumerate_image_dir,
    )

    clip_cfg = get_clip_config(args.clip_model_name)
    model, variables = load_model_variables(clip_cfg, args.clip_path, None, 13)
    # variables as a jit ARGUMENT (closure-captured weights embed as HLO
    # constants and blow the remote-compile request limit at full size)
    jit_encode = jax.jit(lambda v, imgs: model.apply(v, imgs,
                                                     method=model.encode_image)[0])
    encode = lambda imgs: jit_encode(variables, imgs)
    if args.dataset == "fashion200k":
        items = enumerate_fashion200k(args.data_root)
    else:
        items = enumerate_image_dir(args.data_root, args.image_dir)
    ex = PatchExtractor(encode, clip_cfg.input_dim,
                        batch_images=args.batch_images,
                        target_ratio=args.target_ratio)
    return ex.run(items, args.out_dir, write_pack=not args.no_pack)


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: repeat CLI invocations (the
    train → eval → eval workflow) skip recompiles. Opt out with
    FASHIONERN_JAX_CACHE=0; relocate by setting it to a directory."""
    import os

    d = os.environ.get("FASHIONERN_JAX_CACHE",
                       os.path.expanduser("~/.cache/fashionern/jax_cache"))
    if d == "0":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # cache is an optimization, never a requirement
        pass


def main(argv=None) -> int:
    _enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.command == "train":
        run_train(args)
        return 0
    if args.command == "eval":
        metrics = run_eval(args)
        if args.json:
            print(json.dumps(metrics))
        else:
            for k, v in metrics.items():
                print(f"{k}: {v}")
        return 0
    if args.command == "serve":
        run_serve(args)
        return 0
    if args.command == "serve-artifact":
        run_serve_artifact(args)
        return 0
    if args.command == "export":
        manifest = run_export(args)
        print(json.dumps(manifest))
        return 0
    if args.command == "refresh-artifact":
        run_refresh_artifact(args)
        return 0
    if args.command == "extract-patches":
        n = run_extract_patches(args)
        print(f"extracted {n} images")
        return 0
    if args.command == "convert-patches":
        from fashionern_aaai2024_tpu.tools.convert_patches import build_pack, convert_dir

        if args.pack_only:
            n = build_pack(args.src)
        else:
            n = convert_dir(args.src, args.dst)
        print(f"converted {n}")
        return 0
    if args.command == "make-fixture":
        from fashionern_aaai2024_tpu.tools.make_fixture import make_fixture

        root = make_fixture(args.out, args.dataset, dim=args.dim,
                            patch_num=args.patch_num, seed=args.seed,
                            n_images=args.n_images,
                            n_triplets=args.n_triplets,
                            learnable=args.learnable,
                            n_per_color=args.n_per_color,
                            n_queries=args.n_queries)
        print(f"fixture written to {root} (bpe table: {root}/bpe.txt.gz)")
        return 0
    if args.command == "fetch-bpe":
        from fashionern_aaai2024_tpu.tools.fetch_bpe import fetch_bpe

        fetch_bpe(args.dest_dir)
        return 0
    if args.command == "convert-ckpt":
        from fashionern_aaai2024_tpu.tools.convert_checkpoint import convert

        convert(args.src, args.out, kind=args.kind,
                clip_model_name=args.clip_model_name)
        print(f"wrote {args.out}")
        return 0
    print(json.dumps(run_info(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
