"""A/B the NSF vocoder with flax-blocked vs Pallas-fused MRF stages.

Flagship serving shape (1024 mel frames -> 262144 samples @48k, bf16),
honest fetch-synced timing like bench.py. Prints one JSON line with both
RTFs so the mrf_pallas default can be chosen from data.

Usage: python tools/bench_vocoder_mrf.py [--frames 1024] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stylesinger_tpu.utils.backend import enable_compile_cache

    enable_compile_cache("/tmp/jax_bench_cache")

    from stylesinger_tpu.config import load_config
    from stylesinger_tpu.models.hifigan import HifiGanGenerator

    cfg = load_config(vocoder_compute_dtype=args.dtype)
    hop, sr = cfg["hop_size"], cfg["audio_sample_rate"]
    b, frames = args.batch, args.frames
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (b, frames, cfg["audio_num_mel_bins"]))
    f0 = jnp.full((b, frames), 220.0)

    def measure(c):
        gen = HifiGanGenerator(c)
        variables = gen.init({"params": key, "noise": key}, mel, f0)
        synth = jax.jit(lambda v, m, f: gen.apply(v, m, f,
                                                  rngs={"noise": key}))
        wav = synth(variables, mel, f0)
        float(wav.sum())  # compile + completion barrier
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = synth(variables, mel, f0)
        float(out.sum())
        dt = (time.perf_counter() - t0) / args.iters
        return dt

    dt_flax = measure(cfg)
    dt_pallas = measure(dict(cfg, mrf_pallas=True))
    wav_sec = frames * hop / sr * b
    print(json.dumps({
        "metric": "vocoder_mrf_ab",
        "frames": frames, "batch": b, "dtype": args.dtype,
        "backend": jax.default_backend(),
        "flax_ms": round(dt_flax * 1e3, 3),
        "pallas_ms": round(dt_pallas * 1e3, 3),
        "flax_rtf": round(dt_flax / wav_sec, 6),
        "pallas_rtf": round(dt_pallas / wav_sec, 6),
        "speedup": round(dt_flax / dt_pallas, 3),
    }))


if __name__ == "__main__":
    main()
