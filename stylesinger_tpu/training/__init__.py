"""Training runtime: losses, schedules, sharded train step, checkpointing.

Replaces the reference's ``utils/trainer.py`` + ``tasks/base_task.py`` stack
(epoch loop, DDP, AMP, checkpoint-keeper) with a functional TPU design:
one jitted train step sharded over a ``jax.sharding.Mesh``; gradients are
averaged implicitly by SPMD data parallelism (no DDP wrapper); bf16 matmuls
replace AMP; orbax handles checkpoints.
"""

from stylesinger_tpu.training.losses import (  # noqa: F401
    compute_losses, mel_losses, duration_losses, f0_uv_losses, ssim,
)
from stylesinger_tpu.training.schedules import rsqrt_schedule  # noqa: F401
from stylesinger_tpu.training.step import (  # noqa: F401
    Phase, TrainState, make_optimizer, make_train_step, make_train_scan,
    make_eval_step, phase_for_step, init_state,
)
