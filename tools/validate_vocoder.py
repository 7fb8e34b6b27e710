"""Vocoder training-quality validation on the synthetic corpus.

Trains the HiFi-GAN NSF generator + MPD/MSD discriminators
(training/vocoder_task.py) on the binarized synthetic corpus produced by
tools/validate_training.py, then resynthesizes held-out (zero-shot singer)
items from their ground-truth mel + F0 and reports:

- mel_l1 : |mel(wav_gen) - mel(wav_gt)| on full utterances
- ffe    : F0 frame error of the generated audio (tracked with the
           framework's own autocorrelation tracker) vs ground truth

Usage:
  python tools/validate_vocoder.py [--steps 4000] [--dir data/validation]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.validate_training import build_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--dir", default="data/validation")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop_frames", type=int, default=64)
    ap.add_argument("--spd", type=int, default=1,
                    help="GAN steps per device dispatch (>1 = on-device "
                    "lax.scan over a device-resident corpus with on-device "
                    "random crops; the per-step host loop otherwise)")
    ap.add_argument("--overrides", default="",
                    help="extra cfg 'k=v,...' (e.g. "
                    "vocoder_compute_dtype=bfloat16)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from stylesinger_tpu.data.indexed_dataset import IndexedDataset
    from stylesinger_tpu.dsp.pitch import extract_pitch
    from stylesinger_tpu.models.hifigan import HifiGanGenerator
    from stylesinger_tpu.training.vocoder_task import (
        crop_batch, init_vocoder_state, make_vocoder_steps,
    )

    bin_dir = os.path.join(args.dir, "binary")
    work_dir = os.path.join(args.dir, "work_vocoder")
    os.makedirs(work_dir, exist_ok=True)
    cfg = build_cfg(os.path.join(args.dir, "raw"), bin_dir, work_dir,
                    args.steps, overrides=args.overrides)
    # crops are tiny; the blocked MRF path is for long serving buffers
    cfg["mrf_block"] = 0

    train_items = list(IndexedDataset(os.path.join(bin_dir, "train")))
    test_items = list(IndexedDataset(os.path.join(bin_dir, "test")))
    print(f"| vocoder train {len(train_items)} items, "
          f"zero-shot test {len(test_items)}")

    rng = np.random.default_rng(0)
    def sample_items():
        idx = rng.integers(0, len(train_items), args.batch)
        return [train_items[int(j)] for j in idx]

    batch0 = crop_batch(sample_items(), cfg, rng,
                        crop_frames=args.crop_frames)
    state = init_vocoder_state(cfg, jax.random.PRNGKey(0),
                               jnp.asarray(batch0["mels"]),
                               jnp.asarray(batch0["f0"]))

    # resume from the periodic full-state snapshot (hours-long GAN runs
    # must survive tunnel restarts; exit-75 contract like the trainer)
    from flax import serialization
    ckpt_fn = os.path.join(work_dir, "gan_state.msgpack")
    start = 0
    if os.path.exists(ckpt_fn):
        with open(ckpt_fn, "rb") as f:
            state = serialization.from_bytes(state, f.read())
        start = int(state.step)
        print(f"| resumed GAN state at step {start}")

    def save_state(st):
        tmp = ckpt_fn + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(st)))
        os.replace(tmp, ckpt_fn)

    t0 = time.time()
    key = jax.random.PRNGKey(1)
    if args.spd > 1:
        from stylesinger_tpu.training.vocoder_task import (
            make_vocoder_scan, stack_corpus,
        )
        max_t = max(int(it["mel"].shape[0]) for it in train_items)
        data = stack_corpus(train_items, cfg, max_frames=max_t)
        jdata = {k: jax.device_put(jnp.asarray(v)) for k, v in data.items()}
        mb = sum(v.nbytes for v in data.values()) / 1e6
        print(f"| GAN scan dispatch: corpus {mb:.0f} MB device-resident, "
              f"{args.spd} steps/dispatch")
        scan_steps = make_vocoder_scan(cfg)
        i, t_log, i_log = start, time.time(), start
        while i < args.steps:
            w = min(args.spd, args.steps - i, 500 - i % 500)
            state, m = scan_steps(state, jdata, key, w,
                                  args.crop_frames, args.batch)
            i += w
            if i % 500 == 0 or i >= args.steps:
                msg = {k2: round(float(np.asarray(v).mean()), 4)
                       for k2, v in m.items()}
                print(f"| step {i}: {msg} "
                      f"({(i - i_log) / max(time.time() - t_log, 1e-9):.1f} "
                      "steps/s)", flush=True)
                t_log, i_log = time.time(), i
            if i % 5000 == 0:
                save_state(state)
    else:
        gen_step, disc_step = make_vocoder_steps(cfg)
        for i in range(start, args.steps):
            batch = crop_batch(sample_items(), cfg, rng,
                               crop_frames=args.crop_frames)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            k = jax.random.fold_in(key, i)
            state, dm = disc_step(state, jb, k)
            state, gm = gen_step(state, jb, k)
            if (i + 1) % 500 == 0 or i == 0:
                msg = {k2: round(float(v), 4)
                       for k2, v in {**dm, **gm}.items()}
                print(f"| step {i + 1}: {msg} "
                      f"({(i + 1 - start) / (time.time() - t0):.1f}"
                      " steps/s)", flush=True)
            if (i + 1) % 5000 == 0:
                save_state(state)
    save_state(state)
    print(f"| trained to step {args.steps} in {time.time() - t0:.0f}s")

    # ---- resynthesis eval on the held-out singer ----
    gen = HifiGanGenerator(cfg)
    frames = 512
    hop, sr = cfg["hop_size"], cfg["audio_sample_rate"]

    @jax.jit
    def synth(params, mel, f0, rng):
        return gen.apply({"params": params}, mel, f0, rngs={"noise": rng})

    from stylesinger_tpu.eval.metrics import ffe as ffe_fn

    mel_l1s, ffes = [], []
    for i, it in enumerate(test_items[:8]):
        T = min(it["mel"].shape[0], frames)
        mel = np.zeros((1, frames, cfg["audio_num_mel_bins"]), np.float32)
        f0 = np.zeros((1, frames), np.float32)
        mel[0, :T] = it["mel"][:T]
        f0[0, :T] = it["f0"][:T]
        wav_gen = np.asarray(synth(state.gen_params, jnp.asarray(mel),
                                   jnp.asarray(f0),
                                   jax.random.PRNGKey(i)))[0, : T * hop]
        wav_gt = np.asarray(it["wav"])[: T * hop]
        from stylesinger_tpu.dsp.mel import wav2spec_np
        mg = wav2spec_np(wav_gen, sample_rate=sr, n_fft=cfg["fft_size"],
                         hop_size=hop, win_length=cfg["win_size"],
                         n_mels=cfg["audio_num_mel_bins"], fmin=cfg["fmin"],
                         fmax=cfg["fmax"])["mel"]
        mr = wav2spec_np(wav_gt, sample_rate=sr, n_fft=cfg["fft_size"],
                         hop_size=hop, win_length=cfg["win_size"],
                         n_mels=cfg["audio_num_mel_bins"], fmin=cfg["fmin"],
                         fmax=cfg["fmax"])["mel"]
        L = min(len(mg), len(mr))
        mel_l1s.append(float(np.abs(mg[:L] - mr[:L]).mean()))
        f0_gen = extract_pitch(wav_gen, hop_size=hop, sample_rate=sr)
        ffes.append(ffe_fn(it["f0"][:T], f0_gen[:T]))
        from stylesinger_tpu.dsp.mel import save_wav
        save_wav(wav_gen, os.path.join(work_dir, f"gen_{i}.wav"), sr)

    metrics = {"mel_l1": float(np.mean(mel_l1s)),
               "ffe": float(np.mean(ffes)), "steps": args.steps,
               "n_items": len(mel_l1s)}
    print(json.dumps({"metric": "vocoder_validation", **metrics}))
    with open(os.path.join(work_dir, "validation.json"), "w") as f:
        json.dump(metrics, f)

    # persist the trained generator for tools/validate_e2e.py
    from flax import serialization
    with open(os.path.join(work_dir, "gen_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            jax.device_get(state.gen_params)))


if __name__ == "__main__":
    main()
