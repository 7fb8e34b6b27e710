"""Mel-domain comparison: shallow-diffusion post-net vs coarse FS2 decoder.

Scores ``mel_out`` (teacher-forced durations, infer-mode sampling) of the
SAME checkpoint with ``use_diff`` on and off directly against the
ground-truth mel of the zero-shot validation split — no vocoder in the
loop, so the delta isolates what the diffusion post-net adds (the
wav-domain numbers in tools/validate_e2e.py are floored by the validation
vocoder's own distortion). Writes ``<dir>/work/diff_vs_coarse.json``.

Usage:
  python tools/compare_diff_coarse.py [--dir data/validation]
      [--steps 220000] [--items 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.validate_training import build_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/validation")
    ap.add_argument("--items", type=int, default=8)
    ap.add_argument("--steps", type=int, default=220000)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from stylesinger_tpu.data import BucketBatcher, StyleSingerDataset, \
        collate_batch
    from stylesinger_tpu.eval.metrics import mcd as mcd_fn
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.step import init_state
    from stylesinger_tpu.training.trainer import Trainer

    bin_dir = os.path.join(args.dir, "binary")
    work_dir = os.path.join(args.dir, "work")
    cfg = build_cfg(os.path.join(args.dir, "raw"), bin_dir, work_dir,
                    args.steps)

    encoder = build_token_encoder(os.path.join(bin_dir, "phone_set.json"))
    model = StyleSinger(cfg, len(encoder))
    valid_ds = StyleSingerDataset(cfg, "valid")
    trainer = Trainer(model, cfg, work_dir)
    bb = BucketBatcher(valid_ds, cfg, shuffle=False)
    state = init_state(model, cfg, trainer._numeric(
        next(iter(bb.batches(0)))), trainer.rng)
    state, start = trainer.ckpt.restore(state)
    assert start > 0, f"no checkpoint under {work_dir}"
    print(f"| checkpoint: step {start}")
    variables = {"params": state.params, "codebook": state.codebook}

    # the same teacher-forced synth graph as tools/validate_e2e.py (cached)
    def make_synth(use_diff):
        @jax.jit
        def synth(variables, batch, rng):
            return model.apply(
                variables, batch["txt_tokens"], batch["mel2ph"],
                batch["spk_embed"], batch["emo_embed"], batch["mels"],
                batch["f0"], None, None, batch["notes"], batch["note_durs"],
                batch["note_types"], infer=True, use_diff=use_diff,
                rngs={"diffusion": rng, "rq": rng})
        return synth

    synths = {"diff": make_synth(True), "coarse": make_synth(False)}
    rng = jax.random.PRNGKey(2024)
    sums = {k: {"mel_l1": [], "mcd": []} for k in synths}
    for i in range(min(args.items, len(valid_ds))):
        item = valid_ds[i]
        batch = collate_batch([item], cfg["frame_buckets"],
                              cfg["token_buckets"])
        batch.pop("nsamples", None)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        T = int(np.sum(np.asarray(item["mel2ph"]) > 0))
        gt = np.asarray(item["mels"])[:T]
        for name, synth in synths.items():
            ret = synth(variables, batch, jax.random.fold_in(rng, i))
            pred = np.asarray(ret["mel_out"])[0][:T]
            n = min(len(pred), len(gt))
            sums[name]["mel_l1"].append(
                float(np.abs(pred[:n] - gt[:n]).mean()))
            sums[name]["mcd"].append(float(mcd_fn(gt[:n], pred[:n])))

    out = {name: {m: round(float(np.mean(v)), 4) for m, v in d.items()}
           for name, d in sums.items()}
    out["n_items"] = min(args.items, len(valid_ds))
    out["ckpt_step"] = int(start)
    print(json.dumps({"metric": "diff_vs_coarse", **out}))
    with open(os.path.join(work_dir, "diff_vs_coarse.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
