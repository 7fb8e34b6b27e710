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
