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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host initialization (v5e slices / DCN): call once per process
    before any jax op; returns True when the distributed service was
    started. The NCCL-analogue of the reference's
    ``dist.init_process_group`` (utils/trainer.py:460-464).

    Topology comes from args or env (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); on TPU pods all three are
    auto-detected by jax and only the call itself is needed. No-op when no
    coordinator is configured (single-process, the common case here) or
    when already initialized."""
    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    # NB: must not touch the backend (jax.devices/process_count) before
    # initialize() — probe the distributed client state directly
    try:
        already = bool(jax.distributed.is_initialized())
    except AttributeError:  # older jax
        from jax._src import distributed as _dist
        already = _dist.global_state.client is not None
    if already:
        return True
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data < 0:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Tensor-parallel parameter layout for the ``model`` mesh axis.

    Megatron-style split of every TransformerFFN in the FFT blocks — the
    widest matmuls in the model: the first projection (conv1d kernel
    [k, h, 4h]) is column-parallel on its output features, the second
    (dense [4h, h]) row-parallel on its input features, so the block's
    activations stay sharded between the two and XLA inserts exactly one
    reduce over ``model`` per FFN. Everything else is replicated. With
    ``n_model == 1`` all specs collapse to replication (the pure-DP
    layout used by default)."""
    def spec_for(path, x) -> P:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if "TransformerFFN" in p and p.endswith("kernel"):
            if "Conv_" in p and x.ndim == 3:
                return P(None, None, "model")
            if "LambdaDense" in p and x.ndim == 2:
                return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, spec_for(path, x)), params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place ``params`` per :func:`param_shardings`."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(mesh, params))


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
