"""Fast-sampler quality gates (VERDICT r1 #5).

The fast-serving RTF headline numbers ride on two approximate samplers:
- ``pndm_speedup=5``: PLMS on the shallow mel diffusion (the reference
  ships the same option, ``modules/diff/shallow_diffusion_tts.py:165-197``)
- ``f0_speedup=5``: strided DDIM-gaussian/categorical F0 sampler (this
  framework's extension; exact ancestral path at speedup=1)

This tool measures what those approximations COST: it runs the
synthetic-corpus validation split through the trained checkpoint with
each sampler configuration and reports MCD / FFE / duration deltas vs the
exact samplers, writing ``<work_dir>/fast_sampler_gates.json`` and
failing (exit 1) if quality degrades beyond the gates:

    FFE delta   <= 0.02  absolute
    MCD delta   <= 5%    relative

Usage (after tools/validate_training.py produced a checkpoint):
  python tools/eval_fast_samplers.py [--dir data/validation]
      [--steps 110000] [--overrides k=v,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.validate_training import build_cfg, evaluate  # noqa: E402

FFE_DELTA_GATE = 0.02
MCD_REL_GATE = 0.05


def run_config(args, overrides: str):
    import jax

    from stylesinger_tpu.data import BucketBatcher, StyleSingerDataset
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.step import init_state
    from stylesinger_tpu.training.trainer import Trainer

    raw = os.path.join(args.dir, "raw")
    bin_dir = os.path.join(args.dir, "binary")
    work_dir = os.path.join(args.dir, "work")
    cfg = build_cfg(raw, bin_dir, work_dir, args.steps, overrides=overrides)
    encoder = build_token_encoder(os.path.join(bin_dir, "phone_set.json"))
    model = StyleSinger(cfg, len(encoder))
    valid_ds = StyleSingerDataset(cfg, "valid")
    trainer = Trainer(model, cfg, work_dir)
    bb = BucketBatcher(valid_ds, cfg, shuffle=False)
    state = init_state(model, cfg, trainer._numeric(
        next(iter(bb.batches(0)))), trainer.rng)
    state, start = trainer.ckpt.restore(state)
    assert start > 0, f"no checkpoint under {work_dir}"
    return evaluate(cfg, model, state, valid_ds), start


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/validation")
    ap.add_argument("--steps", type=int, default=110000,
                    help="must match the training run (curriculum scaling)")
    ap.add_argument("--overrides", default="",
                    help="base overrides matching the training run")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    base = args.overrides
    configs = {
        "exact": base,
        "plms5": base + ",pndm_speedup=5",
        "f0fast5": base + ",f0_speedup=5",
        "fast_both": base + ",pndm_speedup=5,f0_speedup=5",
        # DPM-Solver++(2M): 10 NFE vs PLMS-5's 20 on the mel stage
        "dpm10": base + ",dpm_steps=10",
        "dpm10_f0fast5": base + ",dpm_steps=10,f0_speedup=5",
    }
    results = {}
    step = None
    for label, ov in configs.items():
        m, step = run_config(args, ov.lstrip(","))
        results[label] = m
        print(f"| {label}: mcd {m['mcd']:.3f} ffe {m['ffe']:.4f} "
              f"dur {m['dur_mae_frames']:.2f}", flush=True)

    exact = results["exact"]
    gates_ok = True
    deltas = {}
    for label in ("plms5", "f0fast5", "fast_both", "dpm10",
                  "dpm10_f0fast5"):
        d_ffe = results[label]["ffe"] - exact["ffe"]
        d_mcd = (results[label]["mcd"] - exact["mcd"]) / max(exact["mcd"],
                                                            1e-9)
        deltas[label] = {"ffe_delta": d_ffe, "mcd_rel_delta": d_mcd}
        ok = d_ffe <= FFE_DELTA_GATE and d_mcd <= MCD_REL_GATE
        gates_ok &= ok
        print(f"| gate {label}: ffe_delta {d_ffe:+.4f} (<= {FFE_DELTA_GATE})"
              f" mcd_rel {d_mcd:+.3f} (<= {MCD_REL_GATE}) -> "
              f"{'OK' if ok else 'FAIL'}")

    out = {"checkpoint_step": step, "results": results, "deltas": deltas,
           "gates": {"ffe_delta": FFE_DELTA_GATE,
                     "mcd_rel_delta": MCD_REL_GATE},
           "ok": bool(gates_ok)}
    out_fn = os.path.join(args.dir, "work", "fast_sampler_gates.json")
    with open(out_fn, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "fast_sampler_gates", **deltas,
                      "ok": bool(gates_ok)}))
    return 0 if gates_ok else 1


if __name__ == "__main__":
    sys.exit(main())
