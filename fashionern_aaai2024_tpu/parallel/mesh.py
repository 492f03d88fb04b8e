"""Device mesh & sharding helpers.

The reference scales with 8-process PyTorch DDP over NCCL
(`/root/reference/run/train/train_fiq.py:225-227`, `:54-59`). Here the
same role is played by a `jax.sharding.Mesh` with a single `data` axis:
batches are sharded over the axis, parameters are replicated, and
gradient reduction is an XLA `psum` riding ICI — no user-visible NCCL.

The only model-state sharding the workload needs is the *gallery*
(retrieval corpus embeddings), which can be sharded over the same axis —
see `fashionern_aaai2024_tpu.retrieval.engine`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """How to lay devices out.

    A single flat `data` axis is the production configuration: the ERN
    fusion model is tens of M params and replicates trivially; CLIP is
    frozen. TP/PP are intentionally not offered (documented decision —
    see SURVEY.md §5 "Parallelism strategies").
    """

    data: int = -1  # -1 = all visible devices

    def resolve(self, devices: Sequence[Any] | None = None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        n = len(devices) if self.data == -1 else self.data
        if n > len(devices):
            raise ValueError(f"requested {n} devices, have {len(devices)}")
        dev_array = np.asarray(devices[:n]).reshape(n)
        return Mesh(dev_array, (DATA_AXIS,))


def create_mesh(num_devices: int = -1, devices: Sequence[Any] | None = None) -> Mesh:
    """Build the 1-D data-parallel mesh over ICI."""
    return MeshSpec(data=num_devices).resolve(devices)


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-side batch pytree onto the mesh, batch-axis sharded.

    Equivalent role to the reference's `DistributedSampler` + `.to(device,
    non_blocking=True)` pair (`run/train/train_fiq.py:65,111-114`), but a
    single host-to-device transfer with the split chosen by XLA.

    Multi-host: each process passes its LOCAL shard (its Loader already
    partitions by rank/world) and the global array is assembled across
    processes; single-process passes the full batch."""
    multihost = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        sharding = data_sharding(mesh, max(x.ndim, 1))
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by mesh size {n}")
    return global_batch // n


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (the reference's `dist.init_process_group`
    TCP rendezvous, `run/train/train_fiq.py:225-227`). On TPU pods the
    arguments come from the environment and may all be None; no-op when
    single-process or already initialized."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator configured) — fine
        pass


def cpu_mesh_env(n: int = 8) -> dict[str, str]:
    """Env vars that fake an `n`-device CPU mesh (for tests / dry runs)."""
    return {
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n} "
        + os.environ.get("XLA_FLAGS", ""),
        "JAX_PLATFORMS": "cpu",
    }
