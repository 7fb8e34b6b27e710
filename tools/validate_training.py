"""End-to-end training-quality validation on the synthetic singing corpus.

Closes the "training-quality validation" gap without external data: builds
a corpus with known ground truth (tools/make_synthetic_corpus.py), runs the
REAL pipeline — binarize -> train (full flagship dims, all losses & the
curriculum) -> inference-mode sampling — and reports objective quality on
the held-out zero-shot singer (s3, never seen in training):

- MCD  : mel-cepstral-ish distortion of the sampled mel vs ground truth
         (teacher-forced durations so frames align; eval/metrics.py::mcd)
- FFE  : F0 frame error of the diffusion-sampled pitch vs ground truth
- dur  : mean abs frame error of free-running predicted durations

Usage:
  python tools/validate_training.py [--steps 3000] [--utts 120] [--dir out]

Prints one JSON line with the metrics and writes them to
<work_dir>/validation.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(raw_dir: str, bin_dir: str, work_dir: str, steps: int,
              tiny: bool = False, overrides: str = ""):
    """overrides: 'k=v,k2=v2' applied last (ints/floats auto-coerced), the
    harness analogue of the reference's --hparams CLI."""
    from stylesinger_tpu.config import load_config

    kw = dict(
        audio_sample_rate=24000, fft_size=512, win_size=512, hop_size=128,
        fmax=12000, fmin=30,
        # vocoder upsampling must equal the hop (prod = 128 at 24 kHz)
        upsample_rates=(8, 4, 2, 2), upsample_kernel_sizes=(16, 8, 4, 4),
        processed_data_dir=raw_dir, binary_data_dir=bin_dir,
        work_dir=work_dir,
        valid_prefixes=["test_"], test_prefixes=["test_"],
        # ONE frame bucket and a fixed sentence cap: every train batch is
        # (8, 1024) (the final partial pads to a pow2) so the compile count
        # stays at ~2 shapes x 4 curriculum phases instead of dozens
        frame_buckets=(1024,), token_buckets=(16,),
        max_frames=1024, max_input_tokens=16,
        max_tokens=16384, max_sentences=8,
        # curriculum scaled to the short run (reference: 20k/20.5k/100k of
        # 320k updates -> same fractions of `steps`)
        forcing=int(steps * 0.08), rq_start=int(steps * 0.1),
        diff_start=int(steps * 0.3),
        max_updates=steps, warmup_updates=max(200, steps // 15),
        val_check_interval=max(250, steps // 6),
        tb_log_interval=50, num_ckpt_keep=2,
        # stochastic style/UMLN stay on (full model)
    )
    if tiny:  # CPU smoke-test of the harness itself, not a quality run
        kw.update(
            hidden_size=64, enc_layers=1, dec_layers=1, num_heads=2,
            predictor_hidden=64, residual_layers=2, residual_channels=32,
            f0_residual_layers=2, f0_residual_channels=32,
            timesteps=8, K_step=8, f0_timesteps=8, f0_K_step=8,
            style_wn_layers=2, style_conv_dilations=(1, 1),
            aligner_layers=1, aligner_ffn_dim=64, rq_depth=2, nRQ=16,
            frame_buckets=(256,), max_frames=256, tb_log_interval=5,
            val_check_interval=10)
    for pair in filter(None, overrides.split(",")):
        k, v = pair.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        kw[k.strip()] = v
    return load_config(**kw)


def evaluate(cfg, model, state, ds, n_items: int = 12):
    """Teacher-forced-duration sampling on held-out items + free-running
    duration error. Returns metric dict."""
    import jax
    import jax.numpy as jnp

    from stylesinger_tpu.data import collate_batch
    from stylesinger_tpu.eval.metrics import ffe, mcd

    variables = {"params": state.params, "codebook": state.codebook}

    @jax.jit
    def synth_tf(variables, batch, rng):
        """Ground-truth mel2ph -> sampled mel + f0 (frame-aligned)."""
        return model.apply(
            variables, batch["txt_tokens"], batch["mel2ph"],
            batch["spk_embed"], batch["emo_embed"], batch["mels"],
            batch["f0"], None, None, batch["notes"], batch["note_durs"],
            batch["note_types"], infer=True, use_diff=True,
            rngs={"diffusion": rng, "rq": rng})

    @jax.jit
    def predict_dur(variables, batch, rng):
        return model.apply(
            variables, batch["txt_tokens"], None, batch["spk_embed"],
            batch["emo_embed"], batch["mels"], batch["f0"], None, None,
            batch["notes"], batch["note_durs"], batch["note_types"],
            infer=True, use_diff=False, skip_decoder=True,
            max_frames=cfg["max_frames"],
            rngs={"diffusion": rng, "rq": rng})["dur_choice"]

    idxs = list(range(min(n_items, len(ds))))
    mcds, ffes, durs = [], [], []
    rng = jax.random.PRNGKey(1234)
    for i in idxs:
        item = ds[i]
        batch = collate_batch([item], cfg["frame_buckets"],
                              cfg["token_buckets"])
        batch.pop("nsamples", None)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        ret = synth_tf(variables, batch, jax.random.fold_in(rng, i))
        T = int(np.sum(np.asarray(item["mel2ph"]) > 0))
        mel_gt = np.asarray(item["mels"])[:T]
        mel_pred = np.asarray(ret["mel_out"])[0, :T]
        f0_gt = np.asarray(item["f0"])[:T]
        uv_gt = np.asarray(item["uv"])[:T]
        # dataset f0 is normalized (log2); denorm for hz-domain FFE
        from stylesinger_tpu.dsp.pitch import denorm_f0
        f0_gt_hz = np.asarray(denorm_f0(
            jnp.asarray(f0_gt), jnp.asarray(uv_gt),
            pitch_norm=cfg["pitch_norm"], f0_mean=cfg["f0_mean"],
            f0_std=cfg["f0_std"]))
        f0_pred_hz = np.asarray(ret["f0_denorm"])[0, :T]
        mcds.append(mcd(mel_gt, mel_pred))
        ffes.append(ffe(f0_gt_hz, f0_pred_hz))

        dur_pred = np.asarray(
            predict_dur(variables, batch,
                        jax.random.fold_in(rng, 1000 + i)))[0]
        m2p = np.asarray(item["mel2ph"])
        n_ph = int(np.asarray(item["txt_tokens"]).shape[0])
        dur_gt = np.bincount(m2p[m2p > 0] - 1, minlength=n_ph)[:n_ph]
        durs.append(float(np.abs(dur_pred[:n_ph] - dur_gt).mean()))
    return {
        "mcd": float(np.mean(mcds)),
        "ffe": float(np.mean(ffes)),
        "dur_mae_frames": float(np.mean(durs)),
        "n_items": len(idxs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--utts", type=int, default=120)
    ap.add_argument("--dir", default="data/validation")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="shrunken dims on CPU: harness smoke test only")
    ap.add_argument("--overrides", default="",
                    help="extra cfg 'k=v,k2=v2' (e.g. pin diff_start when "
                    "resuming a longer run)")
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
    cfg = build_cfg(raw_dir, bin_dir, work_dir, args.steps, tiny=args.tiny,
                    overrides=args.overrides)

    if not (os.path.exists(os.path.join(raw_dir, "metadata.json"))
            and os.path.exists(os.path.join(bin_dir, "train.data"))):
        if args.tiny:
            # already on CPU; run inline
            from stylesinger_tpu.data.binarize import StyleSingingBinarizer
            from tools.make_synthetic_corpus import make_corpus
            if not os.path.exists(os.path.join(raw_dir, "metadata.json")):
                make_corpus(raw_dir, args.utts)
                print(f"| corpus: {args.utts} utts -> {raw_dir}")
            StyleSingingBinarizer(cfg).process()
        else:
            # data phase in a CPU-pinned child: JAX fixes the platform per
            # process, and per-item binarize dispatches are pathological
            # through a remote TPU tunnel (tools/binarize_corpus.py)
            import subprocess
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "binarize_corpus.py"),
                 "--dir", args.dir, "--utts", str(args.utts),
                 "--steps", str(args.steps), "--overrides", args.overrides])
            if r.returncode != 0:
                raise SystemExit(r.returncode)
        print(f"| binarized -> {bin_dir}")

    from stylesinger_tpu.data import BucketBatcher, StyleSingerDataset
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.trainer import Trainer

    encoder = build_token_encoder(os.path.join(bin_dir, "phone_set.json"))
    model = StyleSinger(cfg, len(encoder))
    train_ds = StyleSingerDataset(cfg, "train")
    valid_ds = StyleSingerDataset(cfg, "valid")
    print(f"| train {len(train_ds)} items, valid/zero-shot {len(valid_ds)}")

    trainer = Trainer(model, cfg, work_dir)
    if not args.eval_only:
        from stylesinger_tpu.data import EpochBatches

        def valid_batches():
            bb = BucketBatcher(valid_ds, cfg, shuffle=False,
                               max_tokens=cfg["max_valid_tokens"],
                               max_sentences=cfg["max_valid_sentences"])
            return bb.batches(0)

        # re-iterable per-epoch source: the scan dispatcher materializes
        # one epoch; the streaming fallback reshuffles every pass
        source = EpochBatches(train_ds, cfg)
        t0 = time.time()
        from stylesinger_tpu.training.trainer import HostMemoryExceeded
        try:
            state = trainer.fit(source, valid_batches)
        except HostMemoryExceeded as e:
            # restartable: rerun the same command; fit resumes from the
            # checkpoint the watchdog just saved (exit 75 = EX_TEMPFAIL)
            print(f"| {e}")
            raise SystemExit(75)
        print(f"| trained {args.steps} steps in {time.time() - t0:.0f}s")
    else:
        from stylesinger_tpu.training.step import init_state
        bb = BucketBatcher(train_ds, cfg, shuffle=False)
        state = init_state(model, cfg, trainer._numeric(
            next(iter(bb.batches(0)))), trainer.rng)
        state, start = trainer.ckpt.restore(state)
        print(f"| restored step {start}")

    metrics = evaluate(cfg, model, state, valid_ds)
    metrics["steps"] = args.steps
    print(json.dumps({"metric": "validation", **metrics}))
    with open(os.path.join(work_dir, "validation.json"), "w") as f:
        json.dump(metrics, f)


if __name__ == "__main__":
    main()
