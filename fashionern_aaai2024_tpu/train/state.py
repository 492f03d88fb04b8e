"""Train state: trainable ERN subtree + frozen CLIP + BN stats + Adam.

The reference optimizes only fusion parameters — `Adam(params)` where
`params` excludes any name containing `new_text_projection`, `image_clip`
or `text_clip` (`run/train/train_fiq.py:92-100`). Here the split is
structural: `ern_params` is the optimizer's pytree, `clip_params` is
carried frozen (and every CLIP forward is under `stop_gradient`).

BatchNorm: the ERN's VisualSR BN stats (`models/fusion_model.py:109-113`)
update in train mode. Under pjit with a sharded batch the moments are
computed over the *global* batch (XLA inserts the cross-chip mean) —
SyncBN semantics, a documented improvement over the reference where DDP
broadcasts rank 0's per-rank stats (`broadcast_buffers` default).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


class CIRTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    ern_params: Any
    clip_params: Any
    batch_stats: Any            # full {"clip": ..., "ern": ...} tree (clip part never mutates)
    opt_state: Any
    dropout_rng: jnp.ndarray

    def variables(self) -> dict:
        out = {"params": {"clip": self.clip_params, "ern": self.ern_params}}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def create_train_state(
    variables: dict,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
) -> CIRTrainState:
    """`variables` is the composed model's tree (see
    models.composed.merge_variables)."""
    ern_params = variables["params"]["ern"]
    return CIRTrainState(
        step=jnp.zeros((), jnp.int32),
        ern_params=ern_params,
        clip_params=variables["params"]["clip"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(ern_params),
        dropout_rng=rng,
    )


def trainable_param_count(state: CIRTrainState) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.ern_params))


def cast_frozen_clip_bf16(state: CIRTrainState) -> CIRTrainState:
    """Mixed-precision training policy (SURVEY §5 AMP row): the frozen
    CLIP towers store and compute in bf16 (inputs must also be bf16 so
    flax's dtype promotion keeps bf16 through the towers); the trainable
    ERN params, optimizer state, and loss stay fp32. Replaces the
    reference's CUDA GradScaler+autocast — bf16 needs no loss scaling."""

    def cast(x):
        return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x

    bs = dict(state.batch_stats or {})
    if "clip" in bs:
        bs["clip"] = jax.tree_util.tree_map(cast, bs["clip"])
    return state.replace(
        clip_params=jax.tree_util.tree_map(cast, state.clip_params),
        batch_stats=bs,
    )
