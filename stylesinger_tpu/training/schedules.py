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


# max safe Adam lr for the 20-layer DiffWave eps head: above this its gated
# tanh*sigmoid units saturate and the L1(eps) loss pins at the predict-zero
# baseline E|eps|=sqrt(2/pi) permanently (measured both in this framework
# and in a torch A/B, tools/ab_diffusion_bootstrap.py). The reference never
# trains the head hotter: frozen until diff_start=100k where its schedule
# has decayed to ~4.2e-4 (tasks/StyleSinger/stylesinger.py:60-61).
DIFF_HEAD_MAX_LR = 7e-4


def check_diff_start_lr(cfg) -> float:
    """Warn when a (scaled) curriculum would start training the shallow-
    diffusion mel head at a saturating learning rate. Returns lr(diff_start).
    """
    if cfg.get("decoder") != "diffsinger" or cfg.get("scheduler") != "rsqrt":
        return 0.0
    sched = rsqrt_schedule(cfg["lr"], cfg["warmup_updates"],
                           cfg["hidden_size"])
    lr0 = float(sched(max(int(cfg["diff_start"]), 1)))
    if lr0 > DIFF_HEAD_MAX_LR:
        print(f"| WARN: lr(diff_start={cfg['diff_start']}) = {lr0:.2e} > "
              f"{DIFF_HEAD_MAX_LR:.0e} — the DiffWave mel head saturates "
              f"and never recovers at hot lr. Raise diff_start (lr decays "
              f"as step^-0.5) or keep the reference warmup_updates=8000 "
              f"when scaling the curriculum down.")
    return lr0
