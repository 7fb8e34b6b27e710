"""Quality sweep across the permanent milestone checkpoints of one run.

Answers VERDICT r4 weak #3 ("unexplained FFE regression at full budget"):
restores every ``<work_dir>/ckpt_milestones`` snapshot produced by a
``milestone_interval`` training run and evaluates each with the SAME
held-out zero-shot metrics as tools/validate_training.py (MCD / FFE /
dur-MAE), producing the FFE-vs-step curve that locates where pitch
quality peaks over training.

The jitted samplers are reused across checkpoints (same shapes, new
params), so the sweep pays one compile total. Pass fast-sampler
overrides (``f0_speedup=5,dpm_steps=10``) to run the quality-equivalent
10-NFE path (gates: results/acoustic_320k_fast_sampler_gates.json).

Usage:
  python tools/sweep_milestones.py --dir data/r5full --steps 320000
      [--overrides f0_speedup=5,dpm_steps=10] [--items 12]

Writes <work_dir>/milestone_sweep.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.validate_training import build_cfg, evaluate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/r5full")
    ap.add_argument("--steps", type=int, default=320000,
                    help="must match the run (curriculum scaling)")
    ap.add_argument("--items", type=int, default=12)
    ap.add_argument("--overrides", default="")
    ap.add_argument("--tiny", action="store_true",
                    help="shrunken dims on CPU: harness smoke test only")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    raw_dir = os.path.join(args.dir, "raw")
    bin_dir = os.path.join(args.dir, "binary")
    work_dir = os.path.join(args.dir, "work")
    cfg = build_cfg(raw_dir, bin_dir, work_dir, args.steps,
                    tiny=args.tiny, overrides=args.overrides)

    from stylesinger_tpu.data import BucketBatcher, StyleSingerDataset
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.checkpoint import CheckpointManager
    from stylesinger_tpu.training.step import init_state

    encoder = build_token_encoder(os.path.join(bin_dir, "phone_set.json"))
    model = StyleSinger(cfg, len(encoder))
    train_ds = StyleSingerDataset(cfg, "train")
    valid_ds = StyleSingerDataset(cfg, "valid")

    mgr = CheckpointManager(work_dir, keep=cfg["num_ckpt_keep"],
                            save_best=False)
    steps = mgr.milestone_steps()
    if not steps:
        print(json.dumps({"metric": "milestone_sweep", "error":
                          f"no milestones under {work_dir}/ckpt_milestones"}))
        return 1

    bb = BucketBatcher(train_ds, cfg, shuffle=False)
    from stylesinger_tpu.training.trainer import Trainer
    trainer = Trainer(model, cfg, work_dir)
    state = init_state(model, cfg, trainer._numeric(
        next(iter(bb.batches(0)))), trainer.rng)

    rows = []
    for s in steps:
        state = mgr.restore_milestone(state, s)
        t0 = time.time()
        m = evaluate(cfg, model, state, valid_ds, n_items=args.items)
        m["step"] = s
        m["eval_s"] = round(time.time() - t0, 1)
        rows.append(m)
        print(f"| step {s}: ffe {m['ffe']:.4f} mcd {m['mcd']:.2f} "
              f"dur {m['dur_mae_frames']:.2f} ({m['eval_s']}s)", flush=True)

    # FFE can saturate at the note-prior floor and tie across every
    # checkpoint (tools/ffe_floor.py); break ties by dur-MAE then by
    # step so "best" never selects an early low-quality milestone
    best = min(rows, key=lambda r: (r["ffe"], r["dur_mae_frames"],
                                    -r["step"]))
    out = {"metric": "milestone_sweep", "sampler_overrides": args.overrides,
           "n_items": args.items, "rows": rows,
           "best_ffe_step": best["step"], "best_ffe": best["ffe"]}
    with open(os.path.join(work_dir, "milestone_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
