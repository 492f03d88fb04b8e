"""Multi-PROCESS distributed bring-up (the process boundary the
single-process virtual mesh cannot exercise): coordinator rendezvous,
gloo collectives, per-process batch assembly, loss parity, and
checkpoint portability across process layouts.

Reference capability being matched: the 8-process NCCL TCP launch at
/root/reference/run/train/train_fiq.py:210-227.

r4 lesson: one leg per fresh JAX process cost ~10 minutes of wall time
on a 1-core host (each process pays full import + compile). The merged
drive runs the same five checks in 4 processes — control (2 steps +
mid-run save), one 2-process gang doing BOTH the fresh-save and the
restore-continue legs on one compiled step, and a restore-back control."""

import pytest


@pytest.mark.slow
def test_portability_drive_two_process_parity_and_checkpoint_layouts():
    """One merged drive covers:
      * 2-process gang train-step loss == single-process control
        (deltas["gang_step0_matches_control"], the old
        launch_cpu_simulation check)
      * the same Orbax train state crossing 1x8 -> 2x4 AND 2x4 -> 1x8
        process layouts, continued-step losses equal to the
        uninterrupted control (observed bit-identical on CPU)."""
    from fashionern_aaai2024_tpu.parallel.multiprocess import (
        launch_topology_portability,
    )

    out = launch_topology_portability()
    assert out["devices"] == 8
    assert len(out["control_losses"]) == 2
    assert set(out["deltas"]) == {"gang_step0_matches_control",
                                  "restore_1x8_to_2x4",
                                  "restore_2x4_to_1x8"}
    for name, delta in out["deltas"].items():
        assert delta <= 1e-5, (name, delta)
