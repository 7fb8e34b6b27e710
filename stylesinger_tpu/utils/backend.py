"""Device-backend health probing for remote-PJRT (tunnel) environments.

A broken tunnel makes backend init HANG (retry-sleep inside the plugin),
not error — so health must be probed in a subprocess with a timeout.
Shared by bench.py and __graft_entry__ (review finding: two diverging
copies of the probe logic).
"""

from __future__ import annotations

import subprocess
import sys
import time


def enable_compile_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at ``path`` (best-effort —
    older jax builds lack the knobs). One shared helper for every bench /
    entry-point script: cold flagship compiles are ~15-25 min through the
    remote-PJRT tunnel (and ~13 min on the 1-core CPU host), warm loads
    are seconds."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def run_json_child(argv, env=None, timeout: float = 1800.0):
    """Spawn ``argv``, capture output, and parse the first stdout line that
    looks like a JSON object. Returns ``(row, note)`` — exactly one is
    non-None; ``note`` is a short human-readable failure reason. Never
    raises: bench probes must not kill the headline row."""
    import json

    try:
        r = subprocess.run(argv, env=env, timeout=timeout, text=True,
                           capture_output=True)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            return json.loads(line), None
        return None, f"rc={r.returncode}"
    except subprocess.TimeoutExpired:
        return None, f"exceeded {timeout:.0f}s (cold compile)"
    except Exception as e:
        return None, f"failed: {type(e).__name__}"


def probe_device_backend(timeout_s: int = 240, attempts: int = 2,
                         log=None) -> str:
    """Initialize the default JAX backend in a subprocess and return its
    platform name ('' when unavailable/hung). ``log`` is an optional
    callable for one-line diagnostics (defaults to stderr)."""
    log = log or (lambda m: sys.stderr.write(m + "\n"))
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print(jax.default_backend())"],
                capture_output=True, timeout=timeout_s, text=True)
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip().splitlines()[-1]
            log(f"| backend probe attempt {i + 1}: rc={r.returncode} "
                f"{r.stderr.strip()[-300:]}")
        except subprocess.TimeoutExpired:
            log(f"| backend probe attempt {i + 1}: backend init hung "
                f"> {timeout_s}s")
        time.sleep(5)
    return ""
