"""Full-pipeline validation: trained acoustic model -> trained vocoder.

Chains the checkpoints produced by tools/validate_training.py (acoustic
StyleSinger, data/validation/work) and tools/validate_vocoder.py (HiFi-GAN
NSF, data/validation/work_vocoder) on the held-out ZERO-SHOT singer of the
synthetic corpus: diffusion-sampled mel + F0 (teacher-forced durations so
frames align with ground truth) are vocoded to waveforms, and the audio is
scored against the ground-truth recordings:

- wav_mel_l1 : |mel(wav_gen) - mel(wav_gt)| (full synthesis chain distortion)
- wav_ffe    : F0 frame error of the generated AUDIO (tracked with the
               framework's autocorrelation tracker) vs the ground-truth f0
- also writes e2e_<i>.wav pairs plus one free-running-duration sample per
  item prefix for listening.

Usage:
  python tools/validate_e2e.py [--dir data/validation] [--items 8]
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
    ap.add_argument("--dir", default="data/validation")
    ap.add_argument("--items", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3000,
                    help="must match the acoustic run (curriculum scaling)")
    ap.add_argument("--milestone", type=int, default=0,
                    help="score this ckpt_milestones snapshot instead of "
                    "the latest checkpoint (e.g. the best-FFE step from "
                    "tools/sweep_milestones.py)")
    ap.add_argument("--no_diff", action="store_true",
                    help="score the coarse FS2 decoder instead of the "
                    "shallow-diffusion post-net (the post-net's zero-init "
                    "eps head needs far more steps to leave its baseline — "
                    "verified identical in a torch A/B of the same net)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from flax import serialization

    from stylesinger_tpu.data import BucketBatcher, StyleSingerDataset, \
        collate_batch
    from stylesinger_tpu.dsp.mel import save_wav, wav2spec_np
    from stylesinger_tpu.dsp.pitch import extract_pitch
    from stylesinger_tpu.eval.metrics import ffe as ffe_fn
    from stylesinger_tpu.models.hifigan import HifiGanGenerator
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.step import init_state
    from stylesinger_tpu.training.trainer import Trainer

    bin_dir = os.path.join(args.dir, "binary")
    work_dir = os.path.join(args.dir, "work")
    voc_dir = os.path.join(args.dir, "work_vocoder")
    out_dir = os.path.join(args.dir, "e2e_out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = build_cfg(os.path.join(args.dir, "raw"), bin_dir, work_dir,
                    args.steps)
    cfg["mrf_block"] = 0  # short utterances; blocked MRF is for serving

    # ---- acoustic model from the training-validation checkpoint ----
    encoder = build_token_encoder(os.path.join(bin_dir, "phone_set.json"))
    model = StyleSinger(cfg, len(encoder))
    valid_ds = StyleSingerDataset(cfg, "valid")
    trainer = Trainer(model, cfg, work_dir)
    bb = BucketBatcher(valid_ds, cfg, shuffle=False)
    state = init_state(model, cfg, trainer._numeric(
        next(iter(bb.batches(0)))), trainer.rng)
    if args.milestone:
        state = trainer.ckpt.restore_milestone(state, args.milestone)
        start = args.milestone
    else:
        state, start = trainer.ckpt.restore(state)
        assert start > 0, f"no acoustic checkpoint under {work_dir}"
    print(f"| acoustic checkpoint: step {start}")
    variables = {"params": state.params, "codebook": state.codebook}

    # ---- vocoder from the vocoder-validation run ----
    gen = HifiGanGenerator(cfg)
    probe_mel = jnp.zeros((1, 64, cfg["audio_num_mel_bins"]))
    probe_f0 = jnp.zeros((1, 64))
    gen_vars = gen.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, probe_mel, probe_f0)
    with open(os.path.join(voc_dir, "gen_params.msgpack"), "rb") as f:
        gen_params = serialization.from_bytes(gen_vars["params"], f.read())
    print(f"| vocoder params: {voc_dir}/gen_params.msgpack")

    use_diff = not args.no_diff

    @jax.jit
    def synth_tf(variables, batch, rng):
        return model.apply(
            variables, batch["txt_tokens"], batch["mel2ph"],
            batch["spk_embed"], batch["emo_embed"], batch["mels"],
            batch["f0"], None, None, batch["notes"], batch["note_durs"],
            batch["note_types"], infer=True, use_diff=use_diff,
            rngs={"diffusion": rng, "rq": rng})

    @jax.jit
    def synth_free(variables, batch, rng):
        return model.apply(
            variables, batch["txt_tokens"], None, batch["spk_embed"],
            batch["emo_embed"], batch["mels"], batch["f0"], None, None,
            batch["notes"], batch["note_durs"], batch["note_types"],
            infer=True, use_diff=use_diff, max_frames=cfg["max_frames"],
            rngs={"diffusion": rng, "rq": rng})

    @jax.jit
    def vocode(gp, mel, f0, rng):
        return gen.apply({"params": gp}, mel, f0, rngs={"noise": rng})

    hop, sr = cfg["hop_size"], cfg["audio_sample_rate"]
    mel_kw = dict(sample_rate=sr, n_fft=cfg["fft_size"], hop_size=hop,
                  win_length=cfg["win_size"], n_mels=cfg["audio_num_mel_bins"],
                  fmin=cfg["fmin"], fmax=cfg["fmax"])

    raw_meta = json.load(open(os.path.join(args.dir, "raw",
                                           "metadata.json")))
    wav_by_item = {m["item_name"]: m["wav_fn"] for m in raw_meta}

    rng = jax.random.PRNGKey(2024)
    t0 = time.time()
    mel_l1s, ffes, wav_secs = [], [], 0.0
    for i in range(min(args.items, len(valid_ds))):
        item = valid_ds[i]
        batch = collate_batch([item], cfg["frame_buckets"],
                              cfg["token_buckets"])
        batch.pop("nsamples", None)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        ret = synth_tf(variables, batch, jax.random.fold_in(rng, i))
        T = int(np.sum(np.asarray(item["mel2ph"]) > 0))
        # vocode the full padded bucket (ONE compile for all items), then
        # cut the wav to the true length
        frame_mask = (jnp.arange(ret["mel_out"].shape[1]) < T)
        mel_pred = ret["mel_out"] * frame_mask[None, :, None]
        f0_hz = ret["f0_denorm"] * frame_mask[None, :]
        wav_gen = np.asarray(vocode(gen_params, mel_pred, f0_hz,
                                    jax.random.fold_in(rng, 100 + i))
                             )[0][: T * hop]
        # ground-truth audio from the raw corpus
        from stylesinger_tpu.dsp.mel import load_wav
        wav_gt = load_wav(wav_by_item[item["item_name"]], sr)[: T * hop]
        L = min(len(wav_gen), len(wav_gt))
        mg = wav2spec_np(wav_gen[:L], **mel_kw)["mel"]
        mr = wav2spec_np(wav_gt[:L], **mel_kw)["mel"]
        n = min(len(mg), len(mr))
        mel_l1s.append(float(np.abs(mg[:n] - mr[:n]).mean()))
        f0_gen = extract_pitch(wav_gen[:L], hop_size=hop, sample_rate=sr)
        f0_gt = extract_pitch(wav_gt[:L], hop_size=hop, sample_rate=sr)
        m = min(len(f0_gen), len(f0_gt))
        ffes.append(ffe_fn(f0_gt[:m], f0_gen[:m]))
        wav_secs += L / sr
        save_wav(wav_gen[:L], os.path.join(out_dir, f"e2e_{i}.wav"), sr)
        save_wav(wav_gt[:L], os.path.join(out_dir, f"gt_{i}.wav"), sr)
        if i < 2:  # free-running duration sample for listening
            retf = synth_free(variables, batch,
                              jax.random.fold_in(rng, 200 + i))
            Tf = int(np.sum(np.asarray(retf["mel2ph"])[0] > 0))
            if Tf > 0:
                fm = (jnp.arange(retf["mel_out"].shape[1]) < Tf)
                wav_free = np.asarray(vocode(
                    gen_params, retf["mel_out"] * fm[None, :, None],
                    retf["f0_denorm"] * fm[None, :],
                    jax.random.fold_in(rng, 300 + i)))[0][: Tf * hop]
                save_wav(wav_free, os.path.join(out_dir, f"free_{i}.wav"),
                         sr)

    metrics = {"wav_mel_l1": float(np.mean(mel_l1s)),
               "wav_ffe": float(np.mean(ffes)),
               "n_items": len(mel_l1s), "use_diff": use_diff,
               "acoustic_step": int(start),
               "gen_audio_sec": round(wav_secs, 1),
               "elapsed_sec": round(time.time() - t0, 1)}
    print(json.dumps({"metric": "e2e_validation", **metrics}))
    with open(os.path.join(out_dir, "validation.json"), "w") as f:
        json.dump(metrics, f)


if __name__ == "__main__":
    main()
