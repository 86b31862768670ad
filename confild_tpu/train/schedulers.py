"""Learning-rate schedules.

``cyclic_cosine_decay`` reproduces the reference's ``CyclicCosineDecayLR``
(``cnf/utils/train.py:556-676``): an initial cosine decay over
``init_decay_epochs`` down to ``min_decay_lr``, then either fixed restarts of
``restart_interval`` epochs (optionally geometrically growing by
``restart_interval_multiplier``) at ``restart_lr``, or a constant tail.
Returned as an optax-compatible ``schedule(step) -> lr`` function.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cyclic_cosine_decay(
    init_lr: float,
    init_decay_epochs: int,
    min_decay_lr: float,
    restart_interval: int | None = None,
    restart_interval_multiplier: float | None = None,
    restart_lr: float | None = None,
):
    restart_lr = restart_lr if restart_lr is not None else init_lr

    def _cos(frac, lo, hi):
        return lo + (hi - lo) * (1 + jnp.cos(jnp.pi * frac)) / 2

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        init_phase = _cos(jnp.clip(step / init_decay_epochs, 0, 1),
                          min_decay_lr, init_lr)
        if restart_interval is None:
            return jnp.where(step < init_decay_epochs, init_phase,
                             min_decay_lr)

        t = step - init_decay_epochs
        if restart_interval_multiplier is None:
            frac = (t % restart_interval) / restart_interval
            restart_phase = _cos(frac, min_decay_lr, restart_lr)
        else:
            # geometric cycle lengths: L, L*m, L*m^2, ...
            m = restart_interval_multiplier
            # cycle index n satisfies L*(m^n - 1)/(m - 1) <= t
            ratio = t * (m - 1) / restart_interval + 1
            n = jnp.floor(jnp.log(jnp.maximum(ratio, 1.0)) / math.log(m))
            start = restart_interval * (m ** n - 1) / (m - 1)
            length = restart_interval * m ** n
            frac = jnp.clip((t - start) / length, 0, 1)
            restart_phase = _cos(frac, min_decay_lr, restart_lr)
        return jnp.where(step < init_decay_epochs, init_phase, restart_phase)

    return schedule
