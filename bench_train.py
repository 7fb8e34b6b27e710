"""Training-throughput benchmark: full StyleSinger train step on one chip.

Measures optimizer steps/s at the flagship configuration (batch 8 x 1024 mel
frames = 8192 mel tokens/step, comparable to the reference's
``max_tokens: 10000`` per GPU, egs/stylesinger.yaml:89) with every loss
active (rq + guided + dual F0 diffusion + shallow mel diffusion + l1/ssim).

Usage: python bench_train.py [float32|bfloat16]

Prints ONE JSON line:
  {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": <realtime factor: wav-seconds trained per wall-second>}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main(compute_dtype: str = "float32", batch_size: int = 8,
         frames: int = 1024) -> None:
    import jax

    from stylesinger_tpu.utils.backend import enable_compile_cache

    enable_compile_cache(os.environ.get("BENCH_CACHE_DIR",
                                        "/tmp/jax_bench_cache"))

    import jax.numpy as jnp

    from stylesinger_tpu.config import load_config
    from stylesinger_tpu.data import StyleSingerDataset, collate_batch
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.training import Phase, init_state, make_train_step

    vocab = 64
    t_txt = 128
    cfg = load_config(max_frames=frames, max_input_tokens=t_txt,
                      frame_buckets=(frames,), token_buckets=(t_txt,),
                      compute_dtype=compute_dtype)
    rng = np.random.default_rng(0)
    items = []
    for i in range(batch_size):
        t = frames - int(rng.integers(0, 32))
        tt = t_txt - int(rng.integers(0, 8))
        reps = int(np.ceil(t / tt))
        items.append({
            "item_name": f"i{i}",
            "mel": rng.standard_normal(
                (t, cfg["audio_num_mel_bins"])).astype(np.float32) * 0.5 - 2,
            "mel2ph": np.repeat(np.arange(1, tt + 1), reps)[:t],
            "f0": np.abs(rng.standard_normal(t)).astype(np.float32) * 100
            + 150,
            "ph_token": rng.integers(1, vocab, tt),
            "ep_pitches": rng.integers(40, 80, tt),
            "ep_notedurs": rng.uniform(0.1, 0.6, tt).astype(np.float32),
            "ep_types": np.ones(tt, np.int64),
            "spk_embed": rng.standard_normal(256).astype(np.float32),
            "emo_embed": rng.standard_normal(256).astype(np.float32),
        })
    ds = StyleSingerDataset(cfg, "train", items=items)
    batch = collate_batch([ds[i] for i in range(batch_size)],
                          cfg["frame_buckets"], cfg["token_buckets"])
    batch.pop("nsamples", None)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = StyleSinger(cfg, vocab)
    state = init_state(model, cfg, batch)
    step_fn = make_train_step(model, cfg)
    phase = Phase(use_rq=True, forcing=False, use_diff=True)
    key = jax.random.PRNGKey(0)

    state, metrics = step_fn(state, batch, key, phase)  # compile
    total0 = float(metrics["total_loss"])  # host fetch barrier
    assert np.isfinite(total0), metrics

    # RTT calibration (tunneled device; see bench.py)
    probe = jax.jit(lambda v: v * 2)
    xs = jnp.full((8, 128), 1.0)
    float(probe(xs).sum())
    t0 = time.perf_counter()
    for _ in range(5):
        float(probe(xs).sum())
    rtt = (time.perf_counter() - t0) / 5

    n_iter = 30
    t0 = time.perf_counter()
    for i in range(n_iter):
        state, metrics = step_fn(state, batch, key, phase)
    total = float(metrics["total_loss"])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n_iter
    assert np.isfinite(total)

    steps_per_sec = 1.0 / dt
    hop, sr = cfg["hop_size"], cfg["audio_sample_rate"]
    wav_sec_per_step = batch_size * frames * hop / sr
    realtime = steps_per_sec * wav_sec_per_step
    print(json.dumps({
        "metric": f"train_steps_per_sec_{compute_dtype}",
        "value": round(steps_per_sec, 2), "unit": "steps/s",
        "vs_baseline": round(realtime, 1),
        "backend": jax.default_backend()}))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["float32"]))
