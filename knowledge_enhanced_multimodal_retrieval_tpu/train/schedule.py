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
):
    """Returns ``f(step) -> lr`` with per-epoch cosine annealing."""
    eta_min = base_lr * eta_min_factor

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        cos = jnp.cos(jnp.pi * epoch / epochs)
        return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + cos)

    return schedule
