"""Multi-PROCESS distributed bring-up — the process boundary, executed.

The reference scales by launching 8 OS processes that rendezvous over
TCP and allreduce through NCCL (`torch.distributed.launch` →
`dist.init_process_group("nccl", init_method="tcp://...")`,
`/root/reference/run/train/train_fiq.py:210-227`). The JAX equivalent
is `jax.distributed.initialize` (coordinator rendezvous) + a global
`Mesh` spanning every process's devices + per-process batch assembly
through `jax.make_array_from_process_local_data` — and unlike a
single-process virtual mesh, this path exercises the pieces that
actually break in production: the coordinator handshake, cross-process
collectives, and the local→global array stitching.

Two entry points:
  * `worker_main(...)` — one process of the gang. On a real TPU pod the
    same call sequence runs with no arguments (everything comes from the
    pod environment; `initialize_distributed()` in mesh.py).
  * `launch_cpu_simulation(...)` — spawns N fresh worker processes on
    this host (K virtual CPU devices each, gloo collectives), plus one
    single-process control with the identical global mesh size, and
    asserts the multi-process train-step loss matches the single-process
    loss. This is the CPU stand-in for "launch on a pod slice".

The demo train step is the REAL `build_train_step` shard_map program
(frozen towers + fusion + per-shard-negative BBC + Adam) on the tiny
dryrun config; batch rows are split contiguously across processes so the
global row order — and therefore the per-shard negative groups — is
identical to the single-process control. (The Loader's rank/world
sharding interleaves rows like torch's DistributedSampler; batch
CONTENT parity across launch topologies needs contiguous splits, which
is what `make_array_from_process_local_data` assembles here.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _demo_loss(mesh, n_global_devices: int) -> float:
    """One step of the real shard_map train program on the tiny config;
    the caller provides the mesh (single- or multi-process)."""
    import jax
    import numpy as np
    import optax

    from fashionern_aaai2024_tpu.models.clip.config import (
        CLIPConfig, TextConfig, VisionConfig,
    )
    from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
    from fashionern_aaai2024_tpu.parallel import mesh as meshlib
    from fashionern_aaai2024_tpu.train.state import create_train_state
    from fashionern_aaai2024_tpu.train.step import build_train_step

    cfg = CLIPConfig(
        name="vit-mp-demo",
        vision=VisionConfig(kind="vit", image_size=32, embed_dim=24,
                            width=64, layers=2, heads=4, patch_size=16),
        text=TextConfig(vocab_size=100, context_length=16, width=32,
                        heads=4, layers=2, embed_dim=24),
    )
    model = ComposedCIRModel(cfg, patch_num=13)
    rng = jax.random.PRNGKey(0)
    v = cfg.vision
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, v.image_size, v.image_size, 3), np.float32),
        np.zeros((2, cfg.text.context_length), np.int32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        np.zeros((2, 13, cfg.feature_dim), np.float32),
        deterministic=False, method=model.train_forward,
    )
    optimizer = optax.adam(1e-4)
    state = create_train_state(variables, optimizer, jax.random.PRNGKey(1))
    step = build_train_step(
        model, optimizer, negatives="local", local_groups=n_global_devices,
        mesh=mesh, donate=False,
    )

    g = np.random.default_rng(0)
    b = 2 * n_global_devices
    full = {
        "ref_image": g.random((b, v.image_size, v.image_size, 3),
                              dtype=np.float32),
        "tar_image": g.random((b, v.image_size, v.image_size, 3),
                              dtype=np.float32),
        "text_ids": g.integers(0, 100, (b, cfg.text.context_length))
                     .astype(np.int32),
        "ref_patch": g.standard_normal((b, 13, cfg.feature_dim),
                                       dtype=np.float32),
        "tar_patch": g.standard_normal((b, 13, cfg.feature_dim),
                                       dtype=np.float32),
    }
    nproc = jax.process_count()
    if nproc > 1:
        # this process contributes only its contiguous row range; the
        # global array is stitched by make_array_from_process_local_data
        # inside shard_batch (mesh.py multihost path)
        pid = jax.process_index()
        rows = b // nproc
        local = {k: a[pid * rows:(pid + 1) * rows] for k, a in full.items()}
    else:
        local = full
    batch = meshlib.shard_batch(mesh, local)
    _, loss = step(state, batch)
    return float(loss)


def worker_main(process_id: int, num_processes: int, coordinator: str,
                devices_per_process: int, result_path: str | None) -> None:
    """One gang member. MUST run in a fresh process (before any JAX
    backend initialization)."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    import numpy as np

    from fashionern_aaai2024_tpu.parallel import mesh as meshlib

    n = num_processes * devices_per_process
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == n, (len(jax.devices()), n)
    mesh = meshlib.create_mesh(n)
    loss = _demo_loss(mesh, n)
    print(f"[proc {process_id}/{num_processes}] devices={n} "
          f"local={len(jax.local_devices())} loss={loss:.6f}", flush=True)
    if result_path and process_id == 0:
        with open(result_path, "w") as f:
            json.dump({"loss": loss, "num_processes": num_processes,
                       "devices": n}, f)


def _single_process_control(n_devices: int, result_path: str) -> None:
    """The same program on a single-process virtual mesh (the control)."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from fashionern_aaai2024_tpu.parallel import mesh as meshlib

    mesh = meshlib.create_mesh(n_devices)
    loss = _demo_loss(mesh, n_devices)
    with open(result_path, "w") as f:
        json.dump({"loss": loss, "num_processes": 1, "devices": n_devices}, f)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_cpu_simulation(num_processes: int = 2,
                          devices_per_process: int = 4,
                          port: int | None = None,
                          timeout: int = 1200) -> dict:
    """Spawn the gang + the single-process control; assert loss parity.

    Returns {"multiprocess_loss", "single_process_loss", "num_processes",
    "devices"}. Raises on process failure or loss mismatch. The
    coordinator port is picked dynamically by default (a fixed port
    breaks the rendezvous whenever a stale worker still holds it), and
    every child is killed on any failure path so a timeout cannot leak
    a gang that blocks the next run."""
    import tempfile

    if port is None:
        port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    with tempfile.TemporaryDirectory() as td:
        mp_json = os.path.join(td, "mp.json")
        sp_json = os.path.join(td, "sp.json")
        procs = [
            subprocess.Popen(
                [sys.executable, "-m",
                 "fashionern_aaai2024_tpu.parallel.multiprocess",
                 "--process-id", str(i),
                 "--num-processes", str(num_processes),
                 "--coordinator", f"localhost:{port}",
                 "--devices-per-process", str(devices_per_process),
                 "--result", mp_json],
                env=env)
            for i in range(num_processes)
        ]
        control = subprocess.Popen(
            [sys.executable, "-m",
             "fashionern_aaai2024_tpu.parallel.multiprocess",
             "--single-control", str(num_processes * devices_per_process),
             "--result", sp_json],
            env=env)
        children = procs + [control]
        try:
            codes = [p.wait(timeout=timeout) for p in procs]
            ctrl_code = control.wait(timeout=timeout)
        finally:
            for p in children:
                if p.poll() is None:
                    p.kill()
            for p in children:
                if p.returncode is None:
                    p.wait(timeout=30)
        if any(codes) or ctrl_code:
            raise RuntimeError(
                f"multiprocess bring-up failed: worker codes={codes}, "
                f"control code={ctrl_code}")
        with open(mp_json) as f:
            mp = json.load(f)
        with open(sp_json) as f:
            sp = json.load(f)
    if abs(mp["loss"] - sp["loss"]) > 1e-5:
        raise AssertionError(
            f"loss mismatch: multiprocess {mp['loss']} vs "
            f"single-process {sp['loss']}")
    return {"multiprocess_loss": mp["loss"],
            "single_process_loss": sp["loss"],
            "num_processes": num_processes,
            "devices": num_processes * devices_per_process}


def _cli() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--coordinator", default="localhost:12923")
    p.add_argument("--devices-per-process", type=int, default=4)
    p.add_argument("--result", default=None)
    p.add_argument("--single-control", type=int, default=None)
    args = p.parse_args()
    if args.single_control is not None:
        _single_process_control(args.single_control, args.result)
    elif args.process_id is not None:
        worker_main(args.process_id, args.num_processes, args.coordinator,
                    args.devices_per_process, args.result)
    else:  # launcher mode
        out = launch_cpu_simulation(args.num_processes,
                                    args.devices_per_process)
        print(json.dumps(out))


if __name__ == "__main__":
    _cli()
