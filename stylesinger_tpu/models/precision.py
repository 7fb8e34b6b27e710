"""Trace-time activation compute-dtype control (mixed precision).

The reference's AMP path is torch ``autocast`` + ``GradScaler``
(``utils/trainer.py:87-88,286,304-331``), off by default. On TPU, f32
matmuls/convs already lower to bf16 MXU passes, so the remaining win from
mixed precision is HBM bandwidth on activations (elementwise ops, LayerNorm,
dropout, conv inputs). bf16 has the f32 exponent range, so no loss scaling
is needed — this is a plain compute-dtype switch, not an AMP emulation.

Mechanism: model code passes ``dtype=precision.compute_dtype()`` to its
flax submodules (Dense/Conv/LayerNorm cast inputs+params to that dtype for
the op; params themselves stay f32 in the optimizer). Everything under
``jit`` is traced once, so a trace-time context manager is sufficient —
``training/step.py`` wraps ``model.apply`` in ``with activation_dtype(...)``
and the choice bakes into the compiled graph. Flax LayerNorm computes
mean/var statistics in f32 regardless, and attention logits keep
``preferred_element_type=f32``, so the numerically sensitive reductions
stay full precision.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax.numpy as jnp

_DTYPE: Optional[jnp.dtype] = None  # None = full f32 (parity default)


def compute_dtype() -> Optional[jnp.dtype]:
    """Current activation compute dtype, or None for full precision.

    Read at trace time by model code; pass directly as the ``dtype=`` of
    flax Dense/Conv/LayerNorm (None keeps flax's infer-from-inputs
    behavior, i.e. f32 everywhere)."""
    return _DTYPE


def cast(x):
    """Cast an activation to the current compute dtype (no-op outside an
    ``activation_dtype`` context or for None inputs)."""
    if _DTYPE is None or x is None:
        return x
    return x.astype(_DTYPE)


@contextlib.contextmanager
def activation_dtype(dtype):
    """Set the activation compute dtype for model code traced inside.

    ``dtype`` may be a jnp dtype, a string ("bfloat16"/"float32"), or None.
    "float32"/None leave the default full-precision path untouched.
    """
    global _DTYPE
    if isinstance(dtype, str):
        dtype = None if dtype in ("float32", "") else jnp.dtype(dtype)
    old = _DTYPE
    _DTYPE = dtype
    try:
        yield
    finally:
        _DTYPE = old
