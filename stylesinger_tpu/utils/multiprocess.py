"""Ordered multiprocess map for CPU-heavy offline work.

Parity target: ``multiprocess_run_tqdm`` / ``MultiprocessManager``
(``utils/multiprocess_utils.py:23-159`` in AaronZ345/StyleSinger): a worker
pool consuming (idx, args) jobs and yielding ordered results, used by the
binarizer.  Simplified to ``multiprocessing.Pool.imap`` with an init hook;
set ``num_workers<=1`` (or JAX-in-worker workloads) for in-process mapping.
"""

from __future__ import annotations

import contextlib
import os
import traceback
from typing import Any, Callable, Iterator, List, Optional, Tuple


def _safe_call(job: Tuple[Callable, tuple]) -> Any:
    fn, args = job
    try:
        return fn(*args)
    except Exception:
        traceback.print_exc()
        return None


@contextlib.contextmanager
def host_only_children():
    """Spawned children skip remote-accelerator registration.

    Worker processes do HOST work only (same division as the reference:
    the binarizer pool does CPU DSP, device work stays on the main
    process). On remote-PJRT boxes a sitecustomize registers the tunnel
    backend in EVERY interpreter it is armed for; when the tunnel is
    down, that registration retry-sleeps and wedges each spawn child at
    startup (observed: pool workers asleep forever under a dead tunnel).
    Clearing the arming variables around Process/Pool start keeps the
    children clean CPU interpreters."""
    scrub = ("PALLAS_AXON_POOL_IPS",)
    saved = {k: os.environ.pop(k) for k in scrub if k in os.environ}
    had_platforms = "JAX_PLATFORMS" in os.environ
    prev_platforms = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        yield
    finally:
        os.environ.update(saved)
        if had_platforms:
            os.environ["JAX_PLATFORMS"] = prev_platforms
        else:
            os.environ.pop("JAX_PLATFORMS", None)


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
    # the scrub must span the pool's LIFETIME, not just construction:
    # Pool's maintenance thread respawns signal-killed workers mid-imap,
    # and a replacement spawned after env restore would re-wedge under a
    # dead tunnel (review finding)
    with host_only_children():
        with ctx.Pool(num_workers) as pool:
            for i, res in enumerate(
                    pool.imap(_safe_call, [(fn, a) for a in args_list])):
                yield i, res
