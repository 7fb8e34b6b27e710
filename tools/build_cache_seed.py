"""Build the tracked compile-cache seed for the driver's bench.

Selects from a warm persistent-cache dir exactly the entries bench.py
needs cold (VERDICT r4 weak #1: a cold driver context recompiles the
flagship synthesis + train graphs for 15-25 min each and blows the
driver budget):

- ``jit_synthesize-*``   : the e2e headline + fast_rtf + dpm10_rtf
                           executables (~39 MB each on the v5e)
- ``jit_body-*``         : the train-throughput row's optimizer step
- every entry under ``--small_kb`` (elementwise/init helpers, ~8 MB all
  together)

and tars them (flat) into serving_artifacts/jax_cache_seed.tar.gz, which
``bench.py::seed_compile_cache`` extracts at startup. Cache keys are the
filenames (HLO fingerprint + compile options + versions), so the seed is
valid as long as the model code and jax/XLA versions match the warm run.

Usage:
  python tools/build_cache_seed.py [--cache /tmp/jax_bench_cache]
      [--out serving_artifacts/jax_cache_seed.tar.gz] [--small_kb 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/jax_bench_cache")
    ap.add_argument("--out", default=os.path.join(
        REPO, "serving_artifacts", "jax_cache_seed.tar.gz"))
    ap.add_argument("--small_kb", type=int, default=2048)
    args = ap.parse_args()

    if not os.path.isdir(args.cache):
        print(f"no cache dir {args.cache}", file=sys.stderr)
        return 1
    picked, skipped = [], 0
    for name in sorted(os.listdir(args.cache)):
        path = os.path.join(args.cache, name)
        if not os.path.isfile(path) or name.endswith(".part"):
            continue
        sz = os.path.getsize(path)
        if (name.startswith(("jit_synthesize-", "jit_body-"))
                or sz <= args.small_kb * 1024):
            picked.append((name, sz))
        else:
            skipped += 1
    if not any(n.startswith("jit_synthesize-") for n, _ in picked):
        print("WARN: no jit_synthesize entry in the cache — run "
              "`python bench.py` on the device first", file=sys.stderr)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with tarfile.open(args.out + ".part", "w:gz") as tf:
        for name, _ in picked:
            tf.add(os.path.join(args.cache, name), arcname=name)
    os.replace(args.out + ".part", args.out)
    total = sum(sz for _, sz in picked)
    print(json.dumps({
        "out": os.path.relpath(args.out, REPO), "entries": len(picked),
        "skipped_large": skipped, "raw_mb": round(total / 1e6, 1),
        "tar_mb": round(os.path.getsize(args.out) / 1e6, 1),
        "synthesize": sum(n.startswith("jit_synthesize-")
                          for n, _ in picked),
        "train_body": sum(n.startswith("jit_body-") for n, _ in picked)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
