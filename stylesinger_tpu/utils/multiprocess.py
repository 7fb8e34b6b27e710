"""Ordered multiprocess map for CPU-heavy offline work.

Parity target: ``multiprocess_run_tqdm`` / ``MultiprocessManager``
(``utils/multiprocess_utils.py:23-159`` in AaronZ345/StyleSinger): a worker
pool consuming (idx, args) jobs and yielding ordered results, used by the
binarizer.  Simplified to ``multiprocessing.Pool.imap`` with an init hook;
set ``num_workers<=1`` (or JAX-in-worker workloads) for in-process mapping.
"""

from __future__ import annotations

import traceback
from typing import Any, Callable, Iterator, List, Optional, Tuple


def _safe_call(job: Tuple[Callable, tuple]) -> Any:
    fn, args = job
    try:
        return fn(*args)
    except Exception:
        traceback.print_exc()
        return None


def multiprocess_run(fn: Callable, args_list: List[tuple],
                     num_workers: int = 1,
                     desc: Optional[str] = None) -> Iterator[Tuple[int, Any]]:
    """Yield (idx, fn(*args)) in order; pool only when num_workers > 1."""
    if num_workers <= 1:
        for i, args in enumerate(args_list):
            yield i, _safe_call((fn, args))
        return
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    with ctx.Pool(num_workers) as pool:
        for i, res in enumerate(
                pool.imap(_safe_call, [(fn, a) for a in args_list])):
            yield i, res
