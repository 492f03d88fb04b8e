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

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from fashionern_aaai2024_tpu.train.state import CIRTrainState


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_state(path: str, state: CIRTrainState, *, force: bool = True) -> None:
    """Write the full train state (resume point) to `path`."""
    _checkpointer().save(
        os.path.abspath(path), args=ocp.args.PyTreeSave(state), force=force
    )


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
    (`run/test/test_fiq.py:142-149`)."""
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
    )
    return _checkpointer().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(template, restore_args=restore_args),
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

    def update(self, metric: float, params: Any) -> bool:
        """Save `params` if `metric` improves; returns whether it did."""
        if metric <= self.best_metric:
            return False
        self.best_metric = metric
        save_params(self.best_path, params)
        return True
