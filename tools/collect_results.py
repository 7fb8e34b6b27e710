"""Collect run evidence into results/ with provenance (VERDICT r3 #7).

Copies every known validation / gate / comparison JSON produced under a
run directory into ``results/`` with a provenance envelope: where it came
from, which backend produced it, the git rev, and the date, so every
number in STATUS.md is re-verifiable from the tree.

Usage:
  python tools/collect_results.py --dir data/r4full --tag acoustic_320k
  python tools/collect_results.py --dir data/validation --tag vocoder_100k
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# artifact name -> path candidates relative to --dir
ARTIFACTS = {
    "validation": ["work/validation.json"],
    "diff_vs_coarse": ["work/diff_vs_coarse.json"],
    "fast_sampler_gates": ["work/fast_sampler_gates.json"],
    "vocoder_validation": ["work_vocoder/validation.json"],
    # validate_e2e writes <dir>/e2e_out/validation.json (r4's chain
    # looked in work/ and could never collect it — the stale
    # results/README promise traced back to exactly this)
    "e2e_validation": ["e2e_out/validation.json",
                       "work/e2e_validation.json",
                       "work_vocoder/e2e_validation.json"],
    "milestone_sweep": ["work/milestone_sweep.json"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--tag", required=True,
                    help="prefix for the results/ filenames, e.g. "
                    "acoustic_320k")
    ap.add_argument("--backend", default="tpu")
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=REPO_ROOT).stdout.strip()
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for name, cands in ARTIFACTS.items():
        src = next((os.path.join(args.dir, c) for c in cands
                    if os.path.exists(os.path.join(args.dir, c))), None)
        if src is None:
            continue
        with open(src) as f:
            payload = json.load(f)
        out = {
            "artifact": name,
            "source": src,
            "git_rev": rev,
            "backend": args.backend,
            "collected_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
            "data": payload,
        }
        dst = os.path.join(args.out, f"{args.tag}_{name}.json")
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
        print(f"| {src} -> {dst}")
        n += 1
    if n == 0:
        raise SystemExit(f"| no artifacts found under {args.dir}")


if __name__ == "__main__":
    main()
