"""Tiny-scale trained-weights proof for the DPM-Solver++ mel sampler.

The full-config fast-sampler gates (tools/eval_fast_samplers.py) need the
110k-step TPU checkpoint; this harness gives a *trained-weights* quality
signal on a CPU-only box: train the `--tiny` validation recipe (hidden 64,
K_step=8) on the synthetic corpus, then compare

    exact ancestral (8 steps)  vs  PLMS speedup=2 (4 calls)
    vs  DPM-Solver++(2M) with 4 calls

on held-out items. Pass = DPM@4 within the same MCD/FFE envelope as
PLMS@4 relative to exact (gates mirror eval_fast_samplers.py).

Usage:
  python tools/eval_dpm_tiny.py [--dir data/dpm_tiny] [--steps 1500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FFE_DELTA_GATE = 0.02
MCD_REL_GATE = 0.05


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/dpm_tiny")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--utts", type=int, default=60)
    ap.add_argument("--eval_only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tools.validate_training import build_cfg, evaluate

    raw = os.path.join(args.dir, "raw")
    bin_dir = os.path.join(args.dir, "binary")
    work_dir = os.path.join(args.dir, "work")

    # constant safe lr: the scaled-down rsqrt curriculum would train the
    # DiffWave eps head at >1e-2 (check_diff_start_lr guard; the head
    # saturates permanently above ~7e-4 — see STATUS.md r2 diffusion
    # proof). 5e-4 keeps every subsystem learning at this tiny scale.
    base_ov = ("scheduler=constant,lr=0.0005,"
               "val_check_interval=500,tb_log_interval=100")

    def cfg_with(overrides: str = ""):
        ov = base_ov + ("," + overrides if overrides else "")
        return build_cfg(raw, bin_dir, work_dir, args.steps, tiny=True,
                         overrides=ov)

    cfg = cfg_with()
    if not os.path.exists(os.path.join(raw, "metadata.json")):
        from tools.make_synthetic_corpus import make_corpus
        make_corpus(raw, args.utts)
        print(f"| corpus: {args.utts} utts -> {raw}", flush=True)
    if not os.path.exists(os.path.join(bin_dir, "train.data")):
        from stylesinger_tpu.data.binarize import StyleSingingBinarizer
        StyleSingingBinarizer(cfg).process()
        print(f"| binarized -> {bin_dir}", flush=True)

    from stylesinger_tpu.data import BucketBatcher, StyleSingerDataset
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.step import init_state
    from stylesinger_tpu.training.trainer import Trainer

    encoder = build_token_encoder(os.path.join(bin_dir, "phone_set.json"))

    if not args.eval_only:
        model = StyleSinger(cfg, len(encoder))
        train_ds = StyleSingerDataset(cfg, "train")
        valid_ds = StyleSingerDataset(cfg, "valid")
        trainer = Trainer(model, cfg, work_dir)

        def endless():
            epoch = 0
            while True:
                bb = BucketBatcher(train_ds, cfg, shuffle=True,
                                   seed=cfg["seed"])
                yield from bb.batches(epoch)
                epoch += 1

        def valid_batches():
            bb = BucketBatcher(valid_ds, cfg, shuffle=False,
                               max_sentences=2)
            return bb.batches(0)

        trainer.fit(endless(), valid_batches)
        print("| training done", flush=True)

    # ---- sampler comparison on the trained checkpoint -------------------
    results = {}
    samplers = {
        "exact": "",
        "plms4": "pndm_speedup=2",        # K=8 -> 4 calls
        "dpm4": "dpm_steps=4",            # 4 calls
        "dpm3": "dpm_steps=3",
    }
    step = None
    for label, ov in samplers.items():
        c = cfg_with(ov)
        model = StyleSinger(c, len(encoder))
        valid_ds = StyleSingerDataset(c, "valid")
        trainer = Trainer(model, c, work_dir)
        bb = BucketBatcher(valid_ds, c, shuffle=False)
        state = init_state(model, c, trainer._numeric(
            next(iter(bb.batches(0)))), trainer.rng)
        state, step = trainer.ckpt.restore(state)
        assert step > 0, f"no checkpoint under {work_dir}"
        m = evaluate(c, model, state, valid_ds)
        results[label] = m
        print(f"| {label}: mcd {m['mcd']:.3f} ffe {m['ffe']:.4f}",
              flush=True)

    exact = results["exact"]
    deltas, ok = {}, True
    for label in ("plms4", "dpm4", "dpm3"):
        d_ffe = results[label]["ffe"] - exact["ffe"]
        d_mcd = (results[label]["mcd"] - exact["mcd"]) / max(
            exact["mcd"], 1e-9)
        gate = d_ffe <= FFE_DELTA_GATE and d_mcd <= MCD_REL_GATE
        ok &= gate or label == "dpm3"  # dpm3 is informational
        deltas[label] = {"ffe_delta": round(d_ffe, 5),
                         "mcd_rel_delta": round(d_mcd, 4),
                         "ok": bool(gate)}
        print(f"| gate {label}: ffe {d_ffe:+.4f} mcd_rel {d_mcd:+.3f} -> "
              f"{'OK' if gate else 'FAIL'}", flush=True)

    out = {"checkpoint_step": step, "results": results, "deltas": deltas,
           "ok": bool(ok)}
    with open(os.path.join(work_dir, "dpm_tiny_gates.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "dpm_tiny_gates", **deltas,
                      "ok": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
