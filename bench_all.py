"""Benchmark harness for all five BASELINE.json configs.

Prints one JSON line per config (bench.py remains the driver's single-line
headline benchmark):
  1. feature extraction (mel + F0 + CWT) on test/test.wav
  2. HiFi-GAN NSF vocoder from a precomputed 80-bin mel
  3. FS2 deterministic decode (diffusion off)
  4. full StyleSinger zero-shot transfer (same as bench.py)
  5. batched (8) zero-shot transfer — serving throughput

Timing methodology: host-fetch barriers amortized over queued executions
(see bench.py; block_until_ready is unreliable over a tunneled device).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x, jnp.float32).sum())


def _bench(fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stylesinger_tpu.utils.backend import enable_compile_cache

    # persistent compile cache shared with bench.py
    enable_compile_cache("/tmp/jax_bench_cache")

    from stylesinger_tpu.config import load_config
    from stylesinger_tpu.dsp.cwt import cwt_mexican_hat
    from stylesinger_tpu.dsp.mel import load_wav
    from stylesinger_tpu.dsp.pitch import autocorr_pitch
    from stylesinger_tpu.models.fs2 import FastSpeech2
    from stylesinger_tpu.models.hifigan import HifiGanGenerator
    from stylesinger_tpu.ops import mel_spectrogram

    cfg = load_config(max_frames=1024, max_input_tokens=128,
                      vocoder_compute_dtype="bfloat16")
    sr, hop = cfg["audio_sample_rate"], cfg["hop_size"]
    results = []

    # ---- config 1: feature extraction on test/test.wav -------------------
    try:
        wav = load_wav("/root/reference/test/test.wav", sr)[: sr * 10]
    except Exception:
        wav = np.random.default_rng(0).standard_normal(sr * 10) \
            .astype(np.float32) * 0.1
    jwav = jnp.asarray(wav)

    def features(w):
        mel = mel_spectrogram(w, interpret=False)
        f0 = autocorr_pitch(w, hop_size=hop, sample_rate=sr)
        cwt = cwt_mexican_hat(jnp.log2(jnp.maximum(f0, 1.0)))
        return mel.sum() + f0.sum() + cwt.sum()

    dt = _bench(jax.jit(features), jwav)
    wav_sec = len(wav) / sr
    results.append({"metric": "feature_extract_rtf", "value":
                    round(dt / wav_sec, 6), "unit": "sec/wav-sec"})

    # ---- config 2: vocoder from precomputed mel ---------------------------
    voc = HifiGanGenerator(cfg)
    k = jax.random.PRNGKey(0)
    mel = jax.random.normal(k, (1, 1024, 80)) * 0.3 - 2.0
    f0 = jnp.full((1, 1024), 220.0)
    vv = voc.init({"params": k, "noise": k}, mel, f0)
    voc_fn = jax.jit(lambda v, m, f: voc.apply(v, m, f, rngs={"noise": k}))
    dt = _bench(voc_fn, vv, mel, f0)
    results.append({"metric": "vocoder_rtf",
                    "value": round(dt / (1024 * hop / sr), 6),
                    "unit": "sec/wav-sec"})

    # ---- config 3: FS2 deterministic decode -------------------------------
    fs2 = FastSpeech2(cfg, 64)
    tokens = jax.random.randint(k, (1, 96), 1, 64)
    spk = jax.random.normal(k, (1, 256))
    v = fs2.init({"params": k, "dropout": k}, tokens, None, spk, None, None,
                 infer=True, max_frames=1024)
    fs2_fn = jax.jit(lambda v, t, s: fs2.apply(
        v, t, None, s, None, None, infer=True, max_frames=1024)["mel_out"])
    dt = _bench(fs2_fn, v, tokens, spk)
    results.append({"metric": "fs2_deterministic_rtf",
                    "value": round(dt / (1024 * hop / sr), 6),
                    "unit": "sec/wav-sec"})

    # ---- configs 4 + 5: full zero-shot (reuses bench.py machinery) --------
    import bench as headline
    # config 4 prints its own line via bench.main()
    headline.main()
    # config 5: batched serving throughput, per-utterance RTF
    headline.main(batch=8, metric="e2e_rtf_batch8_per_utt")
    # config 4 variant: PLMS fast sampler on the mel stage (the reference
    # ships the same pndm_speedup switch in its GaussianDiffusion base)
    headline.main(metric="e2e_rtf_plms5", pndm_speedup=5)
    # config 4 variant: fast serving — PLMS-5 mel + strided (DDIM/span) F0
    headline.main(metric="e2e_rtf_fast", pndm_speedup=5, f0_speedup=5)
    # config 4 variant: DPM-Solver++(2M) mel (10 NFE) + strided F0 — the
    # fastest quality-gated serving path
    headline.main(metric="e2e_rtf_dpm", dpm_steps=10, f0_speedup=5)

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
