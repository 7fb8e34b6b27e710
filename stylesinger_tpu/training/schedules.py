"""Learning-rate schedules.

Parity target: ``RSQRTSchedule`` (``utils/common_schedulers.py:4-50`` in
AaronZ345/StyleSinger): lr(t) = base_lr * min(t/warmup, 1) *
max(warmup, t)^-0.5 * hidden^-0.5, floored at 1e-7.  Expressed as an optax
schedule so it can be fused into the optimizer chain.
"""

from __future__ import annotations

import jax.numpy as jnp


def rsqrt_schedule(base_lr: float, warmup_updates: int, hidden_size: int):
    rsqrt_hidden = hidden_size ** -0.5

    def schedule(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        warmup = jnp.minimum(step / warmup_updates, 1.0)
        rsqrt_decay = jnp.maximum(float(warmup_updates), step) ** -0.5
        return jnp.maximum(base_lr * warmup * rsqrt_decay * rsqrt_hidden,
                           1e-7)

    return schedule


def constant_schedule(base_lr: float):
    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32)

    return schedule
