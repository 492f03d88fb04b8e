"""Kernel dispatch + shape utilities.

Every hot op in this package has two implementations:
  * a Pallas TPU kernel (the production path), and
  * a pure-`jnp` XLA fallback (CPU tests, odd shapes, debugging).

Dispatch is automatic: Pallas on TPU backends unless disabled with
`FASHIONERN_NO_PALLAS=1`; the fallback elsewhere. Both paths are
parity-tested against each other (tests/test_ops_*.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_LANE = 128


def use_pallas() -> bool:
    if os.environ.get("FASHIONERN_NO_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_axis_to(x: jnp.ndarray, axis: int, target: int) -> jnp.ndarray:
    """Zero-pad `axis` of x up to length `target` (no-op if already there)."""
    cur = x.shape[axis]
    if cur == target:
        return x
    if cur > target:
        raise ValueError(f"axis {axis} len {cur} > target {target}")
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - cur)
    return jnp.pad(x, pads)


def lane_pad(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Pad an axis up to the TPU lane width multiple (128)."""
    axis = axis % x.ndim
    return pad_axis_to(x, axis, round_up(x.shape[axis], _LANE))
