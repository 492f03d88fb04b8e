"""Checkpointing: full train state + best-model selection via Orbax.

The reference saves only the best model's `state_dict()` (no optimizer,
scheduler, or epoch — `run/train/train_fiq.py:174-175`), and eval loads
a fine-tuned CLIP under key "CLIP" plus a fusion state_dict
(`run/test/test_fiq.py:142-149`). Here:

  * `save_state` / `restore_state` — full resumable train state
    (params, opt state, BN stats, step, rng), which the reference lacks
    (SURVEY §5 checkpoint row).
  * `BestCheckpointer` — reference-equivalent best-on-validation save.
  * torch interop lives in models/{clip,ern}/convert.py (load reference
    `.pth` checkpoints into JAX trees).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from fashionern_aaai2024_tpu.train.state import CIRTrainState


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def _split_state(state: CIRTrainState) -> tuple[dict, dict]:
    """(mutable, frozen) partition of the train state. The frozen CLIP
    towers (params + their never-mutating BN stats, train/state.py) are
    ~18% of the RN50x4 resume state; a periodic checkpoint only needs to
    rewrite what training changes."""
    bs = dict(state.batch_stats or {})
    frozen = {"clip_params": state.clip_params,
              "clip_batch_stats": bs.pop("clip", {})}
    mutable = {"step": state.step, "ern_params": state.ern_params,
               "batch_stats": bs, "opt_state": state.opt_state,
               "dropout_rng": state.dropout_rng}
    return mutable, frozen


# frozen subtrees THIS PROCESS has written: fpath -> fingerprint. The
# skip decision for fingerprinted saves reads only this memo — never the
# filesystem — so (a) a fresh run reusing a previous run's ckpt_dir with
# a different init seed / CLIP source rewrites `.frozen` instead of
# silently keeping stale towers, and (b) in multi-process training every
# process makes the IDENTICAL decision from its identical call sequence
# (an os.path.isdir vote can skew across hosts and desync the collective
# Orbax save; an explicit broadcast collective measured worse — it opens
# its own gloo channel and times out under scheduling skew).
_frozen_written: dict[str, str] = {}


def save_state(path: str, state: CIRTrainState, *, force: bool = True,
               frozen: str = "auto",
               frozen_fingerprint: str | None = None) -> None:
    """Write the train state (resume point) to `path`.

    frozen="auto" (default) uses the SPLIT layout: the mutable subtree
    (trainable params, opt state, ERN BN stats, step, rng) is written to
    `path` on every call, while the frozen CLIP subtree goes to
    `path + ".frozen"` only once per run — it cannot change within a
    run, so a periodic save skips re-serializing it (recipe-scale
    RN50x4: 340 MiB of 1865 MiB per save, and this host's device→host
    path is the save bottleneck). `frozen_fingerprint` identifies the
    frozen towers (init seed + CLIP source, see
    Trainer.save_resume_checkpoint); the first fingerprinted save of a
    process always writes, so a run reusing another run's ckpt_dir can
    never keep stale towers. Without a fingerprint (legacy/demo
    callers) existence skips, as before. frozen="full" writes the
    legacy single-tree layout. `restore_state` reads both
    transparently."""
    path = os.path.abspath(path)
    if frozen == "full":
        _checkpointer().save(path, args=ocp.args.PyTreeSave(state),
                             force=force)
        return
    mutable, fr = _split_state(state)
    fpath = path + ".frozen"
    if frozen_fingerprint is not None:
        skip_frozen = _frozen_written.get(fpath) == frozen_fingerprint
    else:
        skip_frozen = os.path.isdir(fpath)
    if not skip_frozen:
        _checkpointer().save(fpath, args=ocp.args.PyTreeSave(fr), force=force)
        if frozen_fingerprint is not None:
            _frozen_written[fpath] = frozen_fingerprint
    _checkpointer().save(path, args=ocp.args.PyTreeSave(mutable), force=force)


def restore_state(path: str, template: CIRTrainState) -> CIRTrainState:
    """Restore into the tree structure of `template`, TOPOLOGY-FREE.

    Every leaf is restored as host numpy, never with the sharding the
    checkpoint was saved under: left to its default, Orbax re-applies
    the SAVING mesh's sharding from the checkpoint metadata, and a state
    saved on an 8-device mesh then refuses to join a 4-device step
    ("incompatible devices", pinned by tests/test_topology.py). Host
    arrays are the portable form — the train step's jit places (and the
    shard_map replicates) them on whatever mesh the resumed run uses,
    matching the torch reference's topology-free `state_dict` load
    (`run/test/test_fiq.py:142-149`).

    Reads both layouts: the split layout (`path` mutable +
    `path + ".frozen"` CLIP subtree) and the legacy single tree."""

    def _restore(p, tmpl):
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tmpl
        )
        return _checkpointer().restore(
            os.path.abspath(p),
            args=ocp.args.PyTreeRestore(tmpl, restore_args=restore_args),
        )

    fpath = os.path.abspath(path) + ".frozen"
    if not os.path.isdir(fpath):  # legacy single-tree checkpoint
        return _restore(path, template)
    m_tmpl, f_tmpl = _split_state(template)
    mutable = _restore(path, m_tmpl)
    fr = _restore(fpath, f_tmpl)
    bs = dict(mutable["batch_stats"] or {})
    if fr["clip_batch_stats"]:
        bs["clip"] = fr["clip_batch_stats"]
    return template.replace(
        step=mutable["step"], ern_params=mutable["ern_params"],
        clip_params=fr["clip_params"], batch_stats=bs,
        opt_state=mutable["opt_state"], dropout_rng=mutable["dropout_rng"],
    )


def save_params(path: str, params: Any, *, force: bool = True) -> None:
    """Best-model save: parameters only (reference semantics,
    `train_fiq.py:174-175` saves `model.module.state_dict()`)."""
    host = jax.tree_util.tree_map(np.asarray, params)
    _checkpointer().save(os.path.abspath(path), args=ocp.args.PyTreeSave(host), force=force)


def restore_params(path: str, template: Any | None = None) -> Any:
    if template is not None:
        return _checkpointer().restore(
            os.path.abspath(path), args=ocp.args.PyTreeRestore(template)
        )
    return _checkpointer().restore(os.path.abspath(path))


class BestCheckpointer:
    """Tracks the validation selection metric and keeps the best params,
    mirroring the reference's best-checkpoint logic
    (`train_fiq.py:166-175`) but with the directory created and the
    metric initialized (reference defects §2.9.3/§2.9.12 fixed)."""

    def __init__(self, ckpt_dir: str, name: str):
        self.ckpt_dir = ckpt_dir
        self.name = name
        self.best_metric = float("-inf")
        os.makedirs(ckpt_dir, exist_ok=True)

    @property
    def best_path(self) -> str:
        return os.path.join(self.ckpt_dir, f"{self.name}-best")

    def update(self, metric: float, params: Any, meta: dict | None = None) -> bool:
        """Save `params` if `metric` improves; returns whether it did.

        `meta` (JSON-serializable) is written to `<best_path>.meta.json`
        alongside the Orbax dir. The trainer records the model-init seed
        and whether CLIP weights came from a checkpoint, so downstream
        eval/serve/export can reconstruct the EXACT frozen towers this
        fusion subtree was trained against (with random-init CLIP —
        fixture/test world — a different init seed at load time silently
        evaluates the trained params against different towers)."""
        if metric <= self.best_metric:
            return False
        self.best_metric = metric
        save_params(self.best_path, params)
        if meta is not None:
            with open(self.best_path + ".meta.json", "w") as f:
                json.dump({**meta, "metric": metric}, f)
        return True
