"""Device-mesh and sharding helpers (TPU-native parallelism layer).

Replaces the reference's NCCL DDP stack (``utils/trainer.py:439-464``,
``utils/ddp_utils.py``) with a single ``jax.sharding.Mesh``: batches are
sharded over the ``data`` axis, parameters are replicated by default
(with a Megatron-style FFN split available over the ``model`` axis —
``param_shardings``/``shard_params``), and XLA inserts the gradient
all-reduce / tensor-parallel collectives over ICI automatically.
Multi-host slices initialize through ``jax.distributed``
(see ``init_distributed``).
"""

from stylesinger_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, init_distributed, make_mesh, param_shardings,
    replicate_sharding, shard_batch, shard_params,
)
