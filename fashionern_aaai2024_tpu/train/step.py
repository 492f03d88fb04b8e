"""The pjit train step: frozen-CLIP features → ERN → BBC loss → Adam.

One XLA program per step (reference: `train_one_epoch` body,
`run/train/train_fiq.py:106-140`). The batch arrives sharded over the
mesh `data` axis, parameters replicated; gradient reduction is the
`psum` XLA inserts for the mean loss — the NCCL-allreduce boundary of
the reference (`train_fiq.py:54-59`) disappears into the compiled
program. No GradScaler: bf16 needs no loss scaling (SURVEY §5 AMP row).

Negative-sampling semantics:
  * "global" — the loss scores every query against the full logical
    batch. Under jit the batch IS the global batch, so this is the
    default and costs one all-gather that XLA schedules on ICI.
  * "local"  — reproduces the reference's per-rank negatives
    (`losses/loss.py:10-13` runs per DDP process): the batch is split
    into `local_groups` blocks and CE runs block-diagonally. With
    groups == mesh size this matches 8-process DDP bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from fashionern_aaai2024_tpu.ops.losses import batch_based_classification_loss
from fashionern_aaai2024_tpu.train.state import CIRTrainState

TEMPERATURE = 100.0


def grouped_bbc_loss(
    predicted: jnp.ndarray,
    target: jnp.ndarray,
    groups: int,
    temperature: float = TEMPERATURE,
) -> jnp.ndarray:
    """Block-diagonal in-batch CE: per-rank negatives of the reference
    DDP setup, expressed as a reshape + batched matmul."""
    b, d = predicted.shape
    if b % groups:
        raise ValueError(f"batch {b} not divisible by {groups} groups")
    p = predicted.reshape(groups, b // groups, d).astype(jnp.float32)
    t = target.reshape(groups, b // groups, d).astype(jnp.float32)
    s = temperature * jnp.einsum("gqd,gkd->gqk", p, t)
    lse = jax.nn.logsumexp(s, axis=-1)                        # [G, B/G]
    diag = jnp.diagonal(s, axis1=1, axis2=2)                  # [G, B/G]
    return jnp.mean(lse - diag)


def build_train_step(
    model,
    optimizer: optax.GradientTransformation,
    *,
    negatives: str = "local",
    local_groups: int = 1,
    temperature: float = TEMPERATURE,
    forward: Callable | None = None,
    donate: bool = True,
    mesh=None,
) -> Callable[[CIRTrainState, dict], tuple[CIRTrainState, jnp.ndarray]]:
    """Returns `step(state, batch) -> (new_state, loss)`, jit-compiled
    with state donation. `batch` keys: ref_image, tar_image, text_ids,
    ref_patch, tar_patch (all arrays; shard with parallel.mesh.shard_batch).

    `forward` overrides the model method (default
    `model.train_forward`) — used by feature-only training where images
    were pre-encoded.

    `mesh`: with a >1-device mesh the step body runs under
    `jax.shard_map` — each device computes its batch shard through the
    FULL program (the Pallas kernels included; GSPMD has no partitioning
    rule for them and would replicate the towers, verified on the CPU
    mesh) with explicit `pmean` collectives for gradients, loss, and BN
    stats riding ICI. "local" negatives are then simply per-shard BBC —
    exactly the reference's per-rank DDP semantics, no reshape needed.
    Without a mesh the GSPMD path is kept (single chip / tests)."""
    use_shard_map = mesh is not None and mesh.devices.size > 1
    if (use_shard_map and negatives == "local"
            and local_groups not in (1, mesh.devices.size)):
        # Under shard_map the negative groups ARE the mesh shards;
        # honoring a different local_groups silently would change the
        # loss semantics (e.g. 8-process DDP parity asked of a 4-chip
        # mesh). Fail loudly instead.
        raise ValueError(
            f"negatives='local' with local_groups={local_groups} on a "
            f"{mesh.devices.size}-device mesh: shard_map uses per-shard "
            "negatives, so local_groups must equal the mesh size (or 1)."
        )
    method = forward if forward is not None else model.train_forward

    def loss_fn(ern_params, state: CIRTrainState, batch: dict, rng):
        variables = {"params": {"clip": state.clip_params, "ern": ern_params}}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        (fusion, target), mutated = model.apply(
            variables,
            batch["ref_image"],
            batch["tar_image"],
            batch["text_ids"],
            batch["ref_patch"],
            batch["tar_patch"],
            deterministic=False,
            method=method,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        if use_shard_map:
            if negatives == "global":
                loss = batch_based_classification_loss(
                    fusion, target, temperature=temperature,
                    negatives="global", axis_name="data",
                )
            else:  # per-shard negatives == per-rank DDP parity
                loss = batch_based_classification_loss(
                    fusion, target, temperature=temperature
                )
        elif negatives == "local" and local_groups > 1:
            loss = grouped_bbc_loss(fusion, target, local_groups, temperature)
        else:
            loss = batch_based_classification_loss(
                fusion, target, temperature=temperature
            )
        return loss, mutated.get("batch_stats", state.batch_stats)

    def step_body(state: CIRTrainState, batch: dict):
        rng = jax.random.fold_in(state.dropout_rng, state.step)
        if use_shard_map:
            # distinct dropout masks per shard (the global-batch mask of
            # the GSPMD path is equivalent in distribution)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.ern_params, state, batch, rng
        )
        if use_shard_map:
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            if new_stats:
                # running BN stats averaged over shards (sync-BN-style;
                # the reference keeps rank-0's — equivalent in steady
                # state, deterministic here)
                new_stats = jax.lax.pmean(new_stats, "data")
        updates, opt_state = optimizer.update(grads, state.opt_state, state.ern_params)
        ern_params = optax.apply_updates(state.ern_params, updates)
        new_state = state.replace(
            step=state.step + 1,
            ern_params=ern_params,
            opt_state=opt_state,
            batch_stats=new_stats,
        )
        return new_state, loss

    if use_shard_map:
        from jax.sharding import PartitionSpec as P

        body = jax.shard_map(
            step_body, mesh=mesh,
            in_specs=(P(), P("data")), out_specs=(P(), P()),
            check_vma=False,
        )
    else:
        body = step_body

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: CIRTrainState, batch: dict):
        return body(state, batch)

    return step


def build_cached_image_train_step(
    model,
    optimizer: optax.GradientTransformation,
    **kwargs: Any,
):
    """Train step with *cached image features* but ONLINE text encoding
    — the natural TPU recipe for this model family: CLIP is frozen and
    patches are already offline products (SURVEY §0.3-0.4), so the two
    image-tower passes (the bulk of the step's FLOPs) can be done once
    per unique image before training; text must stay online because
    caption randomization changes the text every step
    (`utils/utils.py:102-123`).

    Batch keys: ref_feats, tar_feats [B, d] cached raw CLIP globals;
    text_ids [B, 77]; ref_patch, tar_patch."""

    def forward(mdl_self, ref_feats, tar_feats, text_ids, ref_patch, tar_patch,
                *, deterministic=False):
        text_feats, text_seq = mdl_self.encode_text(
            text_ids, mode="global", visual_emb=ref_patch)
        ref_feats = ref_feats.astype(jnp.float32)
        tar_feats = tar_feats.astype(jnp.float32)
        text_feats = text_feats.astype(jnp.float32)
        text_seq = text_seq.astype(jnp.float32)
        tar_feats = tar_feats / jnp.linalg.norm(tar_feats, axis=-1, keepdims=True)
        return mdl_self.train_features(
            ref_feats, ref_patch, text_feats, text_seq,
            tar_feats, tar_patch, deterministic=deterministic,
        )

    inner = build_train_step(model, optimizer, forward=forward, **kwargs)

    def step(state, batch):
        packed = {
            "ref_image": batch["ref_feats"],
            "tar_image": batch["tar_feats"],
            "text_ids": batch["text_ids"],
            "ref_patch": batch["ref_patch"],
            "tar_patch": batch["tar_patch"],
        }
        return inner(state, packed)

    return step


def build_feature_train_step(
    model,
    optimizer: optax.GradientTransformation,
    **kwargs: Any,
):
    """Train step over *pre-extracted* CLIP features (no image towers in
    the graph) — the fast path when ref/tar globals and text features are
    cached. Batch keys: ref_feats, ref_patch, text_feats, text_seq_feats,
    tar_feats, tar_patch."""

    def forward(mdl_self, ref_feats, tar_feats, text_pair, ref_patch, tar_patch,
                *, deterministic=False):
        text_feats, text_seq_feats = text_pair
        tar_feats = tar_feats / jnp.linalg.norm(tar_feats, axis=-1, keepdims=True)
        return mdl_self.train_features(
            ref_feats, ref_patch, text_feats, text_seq_feats,
            tar_feats, tar_patch, deterministic=deterministic,
        )

    inner = build_train_step(model, optimizer, forward=forward, **kwargs)

    def step(state, batch):
        packed = {
            "ref_image": batch["ref_feats"],
            "tar_image": batch["tar_feats"],
            "text_ids": (batch["text_feats"], batch["text_seq_feats"]),
            "ref_patch": batch["ref_patch"],
            "tar_patch": batch["tar_patch"],
        }
        return inner(state, packed)

    return step
