"""Learning-rate schedules matching the reference trainers.

The reference steps `torch.optim.lr_scheduler.CosineAnnealingLR(
optimizer, T_max=100 * len(train_loader))` once **per iteration**
(`run/train/train_fiq.py:101,140`). Torch's closed form is

    lr(t) = eta_min + (base - eta_min) * (1 + cos(pi * t / T_max)) / 2

which is periodic with period 2*T_max — over a 300-epoch run with
T_max = 100 epochs of steps, the LR completes 1.5 cosine cycles
(down, up, down). We reproduce that closed form exactly rather than
clamping at zero, because it defines the reference training recipe.

`warmup_cosine_schedule` mirrors the (unused-by-trainers) reference
utility `WarmupCosineSchedule` (`utils/utils.py:186-198`): linear
warmup then a single half-cosine decay to zero over the remainder.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_schedule(base_lr: float, t_max: int, eta_min: float = 0.0):
    """Per-step LR, torch `CosineAnnealingLR` closed-form semantics."""

    def schedule(step):
        cos = jnp.cos(jnp.pi * step / t_max)
        return eta_min + (base_lr - eta_min) * (1.0 + cos) / 2.0

    return schedule


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, cycles: float = 0.5
):
    """Reference `WarmupCosineSchedule` (`utils/utils.py:186-198`):
    linear 0→base over `warmup_steps`, then cosine decay with `cycles`
    half-periods over the remaining steps (floored at 0)."""

    def schedule(step):
        warm = base_lr * step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        decay = base_lr * jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * cycles * progress))
        )
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule
