"""Dynamic time warping utilities (F0/prosody comparison metrics).

Parity target: ``utils/dtw.py`` in AaronZ345/StyleSinger (``NaiveDTW``,
``align_from_distances`` — numba-jitted Python loops).  Re-designed as a
``lax.scan`` over the cost-matrix rows, so warping distances run batched on
device; a numpy twin provides the backtraced alignment path for offline
evaluation.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def dtw_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """DTW distance between x [Tx, D] and y [Ty, D] (L2 local cost).

    One scan over rows; each row's prefix-min recurrence is itself a small
    scan (associative-scan-free formulation keeps it simple and exact).
    """
    dist = jnp.sqrt(jnp.maximum(
        ((x[:, None] - y[None, :]) ** 2).sum(-1), 1e-12))  # [Tx, Ty]
    init = jnp.cumsum(dist[0])  # first row: only left moves possible

    def row(prev, d_row):
        def cell(carry, inp):
            left = carry
            up, diag, d = inp
            best = jnp.minimum(jnp.minimum(left, up), diag) + d
            return best, best

        diag = jnp.concatenate([jnp.array([jnp.inf]), prev[:-1]])
        _, cur = jax.lax.scan(cell, jnp.inf, (prev, diag, d_row))
        return cur, None

    final, _ = jax.lax.scan(row, init, dist[1:])
    return final[-1]


def align_from_distances(dist: np.ndarray) -> np.ndarray:
    """Monotonic alignment path from a [Tx, Ty] cost matrix: for each x
    frame the chosen y index (reference ``align_from_distances``)."""
    tx, ty = dist.shape
    acc = np.full((tx, ty), np.inf)
    acc[0] = np.cumsum(dist[0])
    ptr = np.zeros((tx, ty), np.int64)
    for i in range(1, tx):
        for j in range(ty):
            cands = [acc[i - 1, j]]
            if j > 0:
                cands.append(acc[i - 1, j - 1])
                cands.append(acc[i, j - 1])
            k = int(np.argmin(cands))
            acc[i, j] = cands[k] + dist[i, j]
            ptr[i, j] = j if k == 0 else j - 1
    path = np.zeros(tx, np.int64)
    path[-1] = int(np.argmin(acc[-1]))
    for i in range(tx - 2, -1, -1):
        path[i] = min(ptr[i + 1, path[i + 1]], path[i + 1])
    return path


def f0_dtw_error(f0_a: np.ndarray, f0_b: np.ndarray) -> float:
    """DTW-aligned mean absolute F0 error (offline eval metric)."""
    a = f0_a[f0_a > 0][:, None]
    b = f0_b[f0_b > 0][:, None]
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    d = float(dtw_distance(jnp.asarray(a), jnp.asarray(b)))
    return d / max(len(a), len(b))
