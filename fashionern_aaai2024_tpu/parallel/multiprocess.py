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

Entry points:
  * `worker_main(...)` — one process of the gang. On a real TPU pod the
    same call sequence runs with no arguments (everything comes from the
    pod environment; `initialize_distributed()` in mesh.py).
  * `launch_portability_drive(...)` — the MERGED drive (r4 lesson: the
    leg-per-process layout spawned ~10 serial JAX processes on a 1-core
    host and blew the driver's time budget; every fresh process pays
    full import + compile). Three legs, 3–4 processes total:
      A  (1 process, 1×N):  steps 0..1 with a save at step 1  → ck_1xN,
                            control losses [a0, a1]
      CB (2-process gang, 2×N/2): ONE process pair runs BOTH
                            C: fresh step 0 + save → ck_2xH, loss c0
                            B: restore ck_1xN + step 1 → loss b1
                            sharing one compiled step
      D  (optional 4th process, or folded into the caller's own 1×N
          mesh — `__graft_entry__._dryrun_body` does the latter):
                            restore ck_2xH + step 1 → loss d1
    Asserts c0 == a0 (gang parity with the single-process control — the
    old `launch_cpu_simulation` check) and b1 == a1, d1 == a1 (the same
    serialized train state crosses 1×N ↔ 2×N/2 process layouts with the
    continued step's loss equal to the uninterrupted control).
  * `launch_cpu_simulation(...)` — the simple 2-process parity drive
    (kept as the minimal pod-slice stand-in API; the portability drive
    subsumes its check via c0 == a0).

The demo train step is the REAL `build_train_step` shard_map program
(frozen towers + fusion + per-shard-negative BBC + Adam) on the tiny
dryrun config; batch rows are split contiguously across processes so the
global row order — and therefore the per-shard negative groups — is
identical to the single-process control. Per-step batches are seeded by
the ABSOLUTE step number, so a restored run consumes exactly the batches
the control saw at those steps regardless of launch topology.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/fashionern/jax_cache"))


def demo_config():
    """The tiny dryrun CLIP config shared by every leg (and by
    `__graft_entry__._dryrun_body`, whose first train step is therefore
    bit-identical to this module's step-0 control)."""
    from fashionern_aaai2024_tpu.models.clip.config import (
        CLIPConfig, TextConfig, VisionConfig,
    )

    return CLIPConfig(
        name="vit-dryrun",
        vision=VisionConfig(kind="vit", image_size=32, embed_dim=24,
                            width=64, layers=2, heads=4, patch_size=16),
        text=TextConfig(vocab_size=100, context_length=16, width=32,
                        heads=4, layers=2, embed_dim=24),
    )


def demo_batch(step_no: int, n_global_devices: int, cfg=None) -> dict:
    """The FULL (global) demo batch for absolute step `step_no` —
    deterministic in the step number so every topology consumes the
    identical batch stream. Multi-process callers slice their contiguous
    row range (see `_local_rows`)."""
    import numpy as np

    cfg = cfg or demo_config()
    v = cfg.vision
    b = 2 * n_global_devices
    g = np.random.default_rng(step_no)
    return {
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


def _local_rows(batch: dict) -> dict:
    """This process's contiguous row range of a global batch; the global
    array is stitched by `make_array_from_process_local_data` inside
    `shard_batch` (mesh.py multihost path). Contiguous splits keep the
    global row order — and therefore the per-shard negative groups —
    identical to the single-process control (the Loader's rank/world
    sharding interleaves rows like torch's DistributedSampler; batch
    CONTENT parity across launch topologies needs contiguous splits)."""
    import jax

    nproc = jax.process_count()
    if nproc == 1:
        return batch
    pid = jax.process_index()
    b = next(iter(batch.values())).shape[0]
    rows = b // nproc
    return {k: a[pid * rows:(pid + 1) * rows] for k, a in batch.items()}


class DemoProgram:
    """The demo train program, built once per process: model, variables,
    compiled step, and the step-seeded batch stream. Shared by every leg
    (worker gangs, controls, and `__graft_entry__._dryrun_body`) so one
    compile serves everything a process runs — and the program is
    byte-identical across processes, so the persistent compile cache
    serves it across processes too."""

    def __init__(self, mesh, n_global_devices: int):
        import jax
        import numpy as np
        import optax

        from fashionern_aaai2024_tpu.models.composed import ComposedCIRModel
        from fashionern_aaai2024_tpu.parallel import mesh as meshlib
        from fashionern_aaai2024_tpu.train.state import create_train_state
        from fashionern_aaai2024_tpu.train.step import build_train_step

        self.mesh = mesh
        self.n = n_global_devices
        self.cfg = cfg = demo_config()
        self.model = model = ComposedCIRModel(cfg, patch_num=13)
        rng = jax.random.PRNGKey(0)
        v = cfg.vision
        self.variables = model.init(
            {"params": rng, "dropout": rng},
            np.zeros((2, v.image_size, v.image_size, 3), np.float32),
            np.zeros((2, v.image_size, v.image_size, 3), np.float32),
            np.zeros((2, cfg.text.context_length), np.int32),
            np.zeros((2, 13, cfg.feature_dim), np.float32),
            np.zeros((2, 13, cfg.feature_dim), np.float32),
            deterministic=False, method=model.train_forward,
        )
        self.optimizer = optax.adam(1e-4)
        self._create_train_state = create_train_state
        self._meshlib = meshlib
        self.step = build_train_step(
            model, self.optimizer, negatives="local",
            local_groups=n_global_devices, mesh=mesh, donate=False,
        )

    def fresh_state(self):
        import jax

        return self._create_train_state(self.variables, self.optimizer,
                                        jax.random.PRNGKey(1))

    def batch_for(self, state):
        step_no = int(state.step)  # device sync; absolute step index
        return self._meshlib.shard_batch(
            self.mesh, _local_rows(demo_batch(step_no, self.n, self.cfg)))


def _build_demo(mesh, n_global_devices: int):
    prog = DemoProgram(mesh, n_global_devices)
    return prog.fresh_state, prog.step, prog.batch_for


def _gang_barrier(tag: str, timeout_ms: int = 1_200_000) -> None:
    """Cross-process rendezvous over the coordination service (gRPC) —
    deliberately NOT a device collective. The gloo CPU-collectives
    backend bootstraps its context at the gang's FIRST collective
    execution with a hard ~30 s key-exchange timeout; two peers whose
    import/trace/compile phases skew by more than that on a contended
    host fail context init (observed: `Gloo context initialization
    failed: DEADLINE_EXCEEDED: GetKeyValue() timed out`). Workers
    AOT-compile, hit this barrier, then execute — so peers enter the
    gloo bootstrap within milliseconds of each other regardless of how
    unfairly the host scheduled their compiles. No-op single-process."""
    import jax

    if jax.process_count() == 1:
        return
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        f"fashionern_gang_{tag}", timeout_ms)


def _aot_step(step, state, batch):
    """AOT-compile `step` for (state, batch) so execution can be
    separated from compilation (see `_gang_barrier`); falls back to the
    plain jitted callable if lowering is unsupported."""
    try:
        return step.lower(state, batch).compile()
    except Exception:
        return step


def _demo_run(mesh, n_global_devices: int, *, steps: int = 1,
              save_path: str | None = None,
              restore_path: str | None = None,
              save_at_step: int | None = None) -> dict:
    """`steps` steps of the real shard_map train program, optionally
    restoring the train state first, saving it after, and/or saving
    mid-run when `state.step` reaches `save_at_step` (how the control
    leg produces the step-1 checkpoint AND the 2-step loss curve in one
    process)."""
    fresh_state, step, batch_for = _build_demo(mesh, n_global_devices)
    state = fresh_state()
    if restore_path:
        from fashionern_aaai2024_tpu.train.checkpoint import restore_state

        state = restore_state(restore_path, state)

    from fashionern_aaai2024_tpu.train.checkpoint import save_state

    losses = []
    run = None
    for _ in range(steps):
        batch = batch_for(state)
        if run is None:  # compile apart from execution, then rendezvous
            run = _aot_step(step, state, batch)
            _gang_barrier("demo_first_collective")
        state, loss = run(state, batch)
        losses.append(float(loss))
        if save_at_step is not None and int(state.step) == save_at_step:
            assert save_path, "save_at_step requires save_path"
            save_state(save_path, state)

    if save_path and save_at_step is None:
        # EVERY process calls save: Orbax's save is a cross-process
        # collective when jax.distributed is initialized (a process-0-
        # only call deadlocks in sync_global_processes). The state's
        # replicated global arrays are written once by the primary.
        save_state(save_path, state)

    return {"losses": losses, "final_step": int(state.step)}


def _portability_pair_run(mesh, n_global_devices: int, save_path: str,
                          restore_path: str) -> dict:
    """Legs C and B in ONE process (one compile):

      C: fresh state, step 0, save  → `save_path` (the 2×H-layout ckpt)
      B: restore `restore_path` (the 1×N-layout step-1 ckpt), step 1

    Returns {"c0": step-0 loss, "b1": continued-step loss}."""
    from fashionern_aaai2024_tpu.train.checkpoint import (
        restore_state, save_state,
    )

    fresh_state, step, batch_for = _build_demo(mesh, n_global_devices)

    state = fresh_state()
    batch = batch_for(state)
    run = _aot_step(step, state, batch)  # compile BEFORE the rendezvous
    _gang_barrier("pair_first_collective")
    state, c0 = run(state, batch)
    save_state(save_path, state)  # collective across the gang

    restored = restore_state(restore_path, fresh_state())
    restored, b1 = run(restored, batch_for(restored))
    return {"c0": float(c0), "b1": float(b1)}


def _child_env_prelude() -> None:
    """Compile-cache config for freshly spawned JAX processes: every leg
    compiles the same tiny programs; the persistent cache makes repeat
    drives (and the driver's own gate runs) near-compile-free."""
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def worker_main(process_id: int, num_processes: int, coordinator: str,
                devices_per_process: int, result_path: str | None,
                steps: int = 1, save_path: str | None = None,
                restore_path: str | None = None,
                save_at_step: int | None = None,
                portability_pair: bool = False) -> None:
    """One gang member. MUST run in a fresh process (before any JAX
    backend initialization)."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    _child_env_prelude()
    # Generous liveness budgets: on a contended 1-core host a starved
    # gang member can trail its peer by minutes at the shutdown barrier
    # (observed DEADLINE_EXCEEDED with the 300 s default while an
    # on-chip soak shared the core); these gangs validate checkpoint
    # semantics, not failure detection, so slow != dead here.
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               initialization_timeout=1200,
                               heartbeat_timeout_seconds=600,
                               shutdown_timeout_seconds=1200)
    from fashionern_aaai2024_tpu.parallel import mesh as meshlib

    n = num_processes * devices_per_process
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == n, (len(jax.devices()), n)
    mesh = meshlib.create_mesh(n)
    if portability_pair:
        out = _portability_pair_run(mesh, n, save_path, restore_path)
        print(f"[proc {process_id}/{num_processes}] devices={n} "
              f"c0={out['c0']:.6f} b1={out['b1']:.6f}", flush=True)
    else:
        run = _demo_run(mesh, n, steps=steps, save_path=save_path,
                        restore_path=restore_path,
                        save_at_step=save_at_step)
        out = {"loss": run["losses"][-1], "losses": run["losses"],
               "final_step": run["final_step"]}
        print(f"[proc {process_id}/{num_processes}] devices={n} "
              f"local={len(jax.local_devices())} "
              f"loss={out['loss']:.6f}", flush=True)
    if result_path and process_id == 0:
        with open(result_path, "w") as f:
            json.dump({**out, "num_processes": num_processes,
                       "devices": n}, f)


def _single_process_control(n_devices: int, result_path: str,
                            steps: int = 1, save_path: str | None = None,
                            restore_path: str | None = None,
                            save_at_step: int | None = None) -> None:
    """The same program on a single-process virtual mesh (the control)."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    _child_env_prelude()

    from fashionern_aaai2024_tpu.parallel import mesh as meshlib

    mesh = meshlib.create_mesh(n_devices)
    out = _demo_run(mesh, n_devices, steps=steps, save_path=save_path,
                    restore_path=restore_path, save_at_step=save_at_step)
    with open(result_path, "w") as f:
        json.dump({"loss": out["losses"][-1], "losses": out["losses"],
                   "final_step": out["final_step"],
                   "num_processes": 1, "devices": n_devices}, f)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
    return env


_ME = [sys.executable, "-m", "fashionern_aaai2024_tpu.parallel.multiprocess"]


def _wait_all(procs, timeout):
    try:
        codes = [p.wait(timeout=timeout) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            if p.returncode is None:
                p.wait(timeout=30)
    if any(codes):
        raise RuntimeError(f"gang failed: {codes}")


def spawn_portability_gang(devices: int, save_path: str, restore_path: str,
                           result_path: str) -> list:
    """Spawn (do not wait for) the 2-process C+B gang — the caller can
    overlap its own work with the gang's imports/compiles."""
    env = _clean_env()
    port = _free_port()
    dpp = devices // 2
    return [subprocess.Popen(
        _ME + ["--process-id", str(i), "--num-processes", "2",
               "--coordinator", f"localhost:{port}",
               "--devices-per-process", str(dpp),
               "--portability-pair", "--save", save_path,
               "--restore", restore_path, "--result", result_path],
        env=env)
        for i in range(2)]


def launch_portability_drive(devices: int = 8, workdir: str | None = None,
                             timeout: int = 1200,
                             leg_d: bool = True) -> dict:
    """The merged checkpoint-portability drive (module docstring):
    control A (1×N, 2 steps, save at step 1) + gang CB (2×N/2). With
    `leg_d=True` a 4th process restores the gang's checkpoint back onto
    the 1×N layout; `__graft_entry__._dryrun_body` passes False and runs
    leg D on its own already-compiled mesh instead (zero extra
    processes). Asserts every delta ≤ 1e-5 (observed bit-identical on
    CPU; dropout masks agree because both layouts are N global shards —
    train/step.py folds the shard index, not the process id)."""
    import tempfile

    env = _clean_env()
    own_tmp = workdir is None
    td = tempfile.mkdtemp() if own_tmp else workdir
    os.makedirs(td, exist_ok=True)
    try:
        ck_1xn = os.path.join(td, "ck_1xn")
        ck_2xh = os.path.join(td, "ck_2xh")
        ra = os.path.join(td, "a.json")
        rcb = os.path.join(td, "cb.json")

        # A: 1×N control — 2 steps, checkpoint written at step 1
        _wait_all([subprocess.Popen(
            _ME + ["--single-control", str(devices), "--steps", "2",
                   "--save", ck_1xn, "--save-at-step", "1",
                   "--result", ra], env=env)], timeout)
        # CB: one 2-process gang runs C (fresh save) then B (restore)
        _wait_all(spawn_portability_gang(devices, ck_2xh, ck_1xn, rcb),
                  timeout)

        with open(ra) as f:
            a = json.load(f)
        with open(rcb) as f:
            cb = json.load(f)

        checks = {
            "gang_step0_matches_control": abs(cb["c0"] - a["losses"][0]),
            "restore_1x8_to_2x4": abs(cb["b1"] - a["losses"][1]),
        }
        if leg_d:
            rd = os.path.join(td, "d.json")
            _wait_all([subprocess.Popen(
                _ME + ["--single-control", str(devices), "--steps", "1",
                       "--restore", ck_2xh, "--result", rd], env=env)],
                timeout)
            with open(rd) as f:
                d = json.load(f)
            checks["restore_2x4_to_1x8"] = abs(d["losses"][0] - a["losses"][1])

        for name, delta in checks.items():
            if delta > 1e-5:
                raise AssertionError(f"{name}: |Δloss| = {delta}")
        return {"control_losses": a["losses"], "deltas": checks,
                "devices": devices, "ck_2xh": ck_2xh,
                "workdir": td, "owns_workdir": own_tmp}
    except BaseException:
        if own_tmp:
            import shutil

            shutil.rmtree(td, ignore_errors=True)
        raise


def launch_cpu_simulation(num_processes: int = 2,
                          devices_per_process: int = 4,
                          port: int | None = None,
                          timeout: int = 1200) -> dict:
    """Spawn a worker gang + the single-process control; assert loss
    parity. The minimal "launch on a pod slice" stand-in API — the
    merged `launch_portability_drive` subsumes this check (c0 == a0)
    and is what the driver gate and the test suite run.

    Returns {"multiprocess_loss", "single_process_loss", "num_processes",
    "devices"}. Raises on process failure or loss mismatch. The
    coordinator port is picked dynamically by default (a fixed port
    breaks the rendezvous whenever a stale worker still holds it), and
    every child is killed on any failure path so a timeout cannot leak
    a gang that blocks the next run."""
    import tempfile

    if port is None:
        port = _free_port()
    env = _clean_env()
    with tempfile.TemporaryDirectory() as td:
        mp_json = os.path.join(td, "mp.json")
        sp_json = os.path.join(td, "sp.json")
        procs = [
            subprocess.Popen(
                _ME + ["--process-id", str(i),
                       "--num-processes", str(num_processes),
                       "--coordinator", f"localhost:{port}",
                       "--devices-per-process", str(devices_per_process),
                       "--result", mp_json],
                env=env)
            for i in range(num_processes)
        ]
        control = subprocess.Popen(
            _ME + ["--single-control",
                   str(num_processes * devices_per_process),
                   "--result", sp_json],
            env=env)
        _wait_all(procs + [control], timeout)
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


def launch_topology_portability(devices: int = 8, port: int | None = None,
                                timeout: int = 1200) -> dict:
    """Checkpoint portability across PROCESS LAYOUTS (kept API): the
    same serialized train state crosses 1×8 → 2×4 AND 2×4 → 1×8 with
    the continued step's loss identical to the uninterrupted control.
    Now a thin wrapper over the merged `launch_portability_drive`
    (4 processes total; the old leg-per-process layout spawned 7)."""
    out = launch_portability_drive(devices=devices, timeout=timeout,
                                   leg_d=True)
    if out.get("owns_workdir"):
        import shutil

        shutil.rmtree(out["workdir"], ignore_errors=True)
    return {"control_losses": out["control_losses"],
            "deltas": out["deltas"], "devices": out["devices"]}


def _cli() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--coordinator", default="localhost:12923")
    p.add_argument("--devices-per-process", type=int, default=4)
    p.add_argument("--result", default=None)
    p.add_argument("--single-control", type=int, default=None)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--save", default=None)
    p.add_argument("--restore", default=None)
    p.add_argument("--save-at-step", type=int, default=None)
    p.add_argument("--portability-pair", action="store_true")
    p.add_argument("--topology-portability", action="store_true")
    args = p.parse_args()
    if args.topology_portability:
        print(json.dumps(launch_topology_portability()))
    elif args.single_control is not None:
        _single_process_control(args.single_control, args.result, args.steps,
                                args.save, args.restore, args.save_at_step)
    elif args.process_id is not None:
        worker_main(args.process_id, args.num_processes, args.coordinator,
                    args.devices_per_process, args.result, args.steps,
                    args.save, args.restore, args.save_at_step,
                    args.portability_pair)
    else:  # launcher mode
        out = launch_cpu_simulation(args.num_processes,
                                    args.devices_per_process)
        print(json.dumps(out))


if __name__ == "__main__":
    _cli()
