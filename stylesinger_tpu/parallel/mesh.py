"""Mesh construction and batch/param shardings.

The reference's only parallelism is 1-process-per-GPU DDP with NCCL
all-reduce (``utils/trainer.py:94-107``, ``utils/ddp_utils.py:8-165``) and
per-rank batch splits (``tasks/tts/tts_base.py:129-132``).  Here the same
data parallelism is a sharding annotation: the batch leading axis lives on
the ``data`` mesh axis, parameters are replicated, and the compiler emits
the psum over ICI.  The extra ``model`` axis (default size 1) is reserved
for tensor-parallel layouts at larger scales.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Multi-host initialization (v5e slices): call once per process before
    any jax op. No-op when single-process (the common case here)."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data < 0:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place each [B, ...] array with B sharded over the 'data' axis.

    B is zero-padded up to a multiple of the data-axis size (extra rows are
    all-padding and masked out downstream by txt_tokens==0 / mel2ph==0)."""
    sh = batch_sharding(mesh)
    n = mesh.shape["data"]

    def place(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        if x.ndim == 0:
            return jax.device_put(x, replicate_sharding(mesh))
        b = x.shape[0]
        pad = (-b) % n
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = np.pad(np.asarray(x), widths)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, batch)
