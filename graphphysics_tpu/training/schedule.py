"""Learning-rate schedule matching the reference ``CosineWarmupScheduler``
(``graphphysics/utils/scheduler.py:8-67``), expressed as an optax schedule.

factor(step) = max(0.5*(1+cos(pi*(step+1)/max_iters)) * warmup_scale, min_lr_factor)
with warmup_scale = min(1, (step+1)/warmup) — the reference *multiplies* the
cosine by the linear warmup during warmup, it does not replace it.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup_schedule(
    learning_rate: float,
    warmup: int,
    max_iters: int,
    min_lr_factor: float = 0.001,
):
    def schedule(step):
        # clamp past max_iters: the cosine would pass pi and RAMP BACK UP if
        # more steps are dispatched than the schedule was built for
        epoch = jnp.minimum(step + 1.0, float(max_iters))
        lr_factor = 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / max_iters))
        warm = jnp.where(epoch <= warmup, epoch / max(warmup, 1), 1.0)
        lr_factor = jnp.maximum(lr_factor * warm, min_lr_factor)
        return learning_rate * lr_factor

    return schedule
