"""Learning-rate schedules.

The reference steps ``CosineAnnealingLR(T_max=epochs, eta_min=0.1*lr)`` once
per *epoch* (``trainer.py:304-305,488-492``). ``cosine_annealing_lr`` keeps
that epoch granularity (a step function of the optimizer step), so LR values
match the reference run epoch-for-epoch.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_lr(
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    eta_min_factor: float = 0.1,
    warmup_steps: int = 0,
):
    """Returns ``f(step) -> lr`` with per-epoch cosine annealing.

    ``warmup_steps > 0`` multiplies the first optimizer steps by a linear
    ramp ``(step + 1) / warmup_steps`` — the standard warmup the reference
    lacks (its very first step runs at full lr, ``trainer.py:488-492``).
    The cosine phase stays keyed on the raw step so epoch boundaries match
    the reference run exactly once the ramp ends.
    """
    eta_min = base_lr * eta_min_factor

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        cos = jnp.cos(jnp.pi * epoch / epochs)
        lr = eta_min + 0.5 * (base_lr - eta_min) * (1.0 + cos)
        if warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (step + 1.0) / warmup_steps)
        return lr

    return schedule
