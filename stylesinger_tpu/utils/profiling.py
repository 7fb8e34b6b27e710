"""On-device step profiling: trace a callable, aggregate XLA op times.

The reference's only tracing is a wall-clock ``utils.Timer``
(``utils/__init__.py:243-264``) and an optional ``pytorch_memlab`` pass
(``tasks/tts/fs2.py:271-283``). Here ``jax.profiler`` device traces are
parsed into a per-HLO-op cost table — this is the tool that found the two
big round-1 wins (the SSIM depthwise-conv pathology in the train step and
the vocoder MRF conv-tiling collapse). Works over the axon TPU tunnel: the
trace's ``/device:TPU:0`` process carries an "XLA Ops" lane.

Usage::

    from stylesinger_tpu.utils.profiling import profile_step
    rows = profile_step(lambda: step_fn(state, batch, rng, phase),
                        iters=3, trace_dir="/tmp/trace")
    print(format_table(rows))
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
from typing import Any, Callable, Dict, List, Optional

import jax


def _latest_trace(trace_dir: str) -> Optional[str]:
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    return max(files, key=os.path.getmtime) if files else None


def parse_trace(trace_file: str, device_only: bool = True
                ) -> List[Dict[str, Any]]:
    """Aggregate complete events by op name -> list of rows sorted by total
    duration (microseconds). Picks the device process when present, else
    falls back to the host lane (CPU-only runs)."""
    with gzip.open(trace_file) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = [p for p, n in proc_names.items() if "device" in n.lower()]
    want = set(device_pids) if (device_only and device_pids) else set(
        proc_names)

    # prefer the "XLA Ops" thread when thread names are present
    tid_names = collections.defaultdict(dict)
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[e["pid"]][e["tid"]] = e.get("args", {}).get("name", "")

    dur = collections.Counter()
    count = collections.Counter()
    meta: Dict[str, Dict[str, str]] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in want:
            continue
        tname = tid_names.get(e["pid"], {}).get(e.get("tid"), "")
        if device_pids and tname and tname != "XLA Ops":
            continue
        name = e["name"]
        dur[name] += e.get("dur", 0)
        count[name] += 1
        if name not in meta:
            args = e.get("args", {})
            meta[name] = {
                "category": args.get("hlo_category", ""),
                "long_name": args.get("long_name", ""),
            }
    rows = []
    for name, d in dur.most_common():
        rows.append({"name": name, "total_us": d, "count": count[name],
                     **meta.get(name, {})})
    return rows


def profile_step(fn: Callable[[], Any], iters: int = 3,
                 trace_dir: Optional[str] = None) -> List[Dict[str, Any]]:
    """Run ``fn`` ``iters`` times under a jax.profiler trace and return the
    aggregated per-op table. ``fn`` should be pre-compiled (call it once
    before profiling) and must block on / return its outputs."""
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="ss_trace_")
    jax.profiler.start_trace(trace_dir)
    try:
        out = None
        for _ in range(iters):
            out = fn()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out)
    finally:
        jax.profiler.stop_trace()
    trace_file = _latest_trace(trace_dir)
    if trace_file is None:
        return []
    rows = parse_trace(trace_file)
    for r in rows:
        r["per_iter_us"] = r["total_us"] / max(iters, 1)
    return rows


def format_table(rows: List[Dict[str, Any]], top: int = 20,
                 iters: int = 1) -> str:
    lines = ["per-op device time (aggregated over trace):"]
    for r in rows[:top]:
        per = r.get("per_iter_us", r["total_us"]) / 1e3
        lines.append(
            f"{per:9.3f} ms  x{r['count']:5d}  [{r.get('category', ''):>20s}]"
            f"  {(r.get('long_name') or r['name'])[:100]}")
    return "\n".join(lines)
