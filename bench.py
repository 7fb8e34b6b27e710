"""End-to-end inference benchmark: zero-shot style transfer RTF on one chip.

Measures wav-seconds synthesized per wall-second (acoustic model with
2x100-step F0 diffusion + 100-step shallow mel diffusion, then the HiFi-GAN
NSF vocoder) at 48 kHz / hop 256 — the reference's headline inference
workload (BASELINE.md: target RTF < 0.05 per v5e chip).

Prints ONE JSON line:
  {"metric": "e2e_rtf", "value": <content_rtf>, "unit": "sec/wav-sec",
   "vs_baseline": <0.05 / rtf>,   # >1 means faster than the target
   "buffer_rtf": ..., "content_fill": ~1.0,   # score-derived GT mel2ph
   "train_steps_per_sec": ...}    # time-boxed bench_train.py merge
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

# One shared persistent compile-cache dir for the headline and every child
# probe. Overridable so the evidence chain can warm a DEDICATED dir whose
# whole contents are exactly the bench's compiles (tools/r5_chain.sh tars
# it into serving_artifacts/jax_cache_seed.tar.gz).
CACHE_DIR = os.environ.get("BENCH_CACHE_DIR", "/tmp/jax_bench_cache")

# Global wall-clock budget for the WHOLE bench (probe + headline + extras
# + fallback). The driver's own timeout killed round 4's bench at rc=124
# with no number because child time-boxes summed to ~13,500 s; everything
# below derives its budget from what remains of this deadline instead.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "2280"))
_T0 = time.monotonic()


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def seed_compile_cache() -> None:
    """Extract the tracked compile-cache seed into ``CACHE_DIR`` (existing
    entries kept). The seed is produced on the same tunneled v5e by the
    evidence chain, so a cold driver context (fresh /tmp) still gets
    warm-cache compiles (~seconds) instead of the 15-25 min cold flagship
    compile that blew round 4's driver budget."""
    import tarfile

    seed = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serving_artifacts", "jax_cache_seed.tar.gz")
    if not os.path.exists(seed):
        return
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        n = 0
        with tarfile.open(seed) as tf:
            for m in tf.getmembers():
                if not m.isfile():
                    continue
                out = os.path.join(CACHE_DIR, os.path.basename(m.name))
                if os.path.exists(out):
                    continue
                src = tf.extractfile(m)
                with open(out + ".part", "wb") as w:
                    w.write(src.read())
                os.replace(out + ".part", out)
                n += 1
        sys.stderr.write(f"| compile-cache seed: +{n} entries\n")
    except Exception as e:  # a corrupt seed must never kill the bench
        sys.stderr.write(f"| compile-cache seed skipped: {e}\n")


def main(batch: int = 1, metric: str = "e2e_rtf", cpu_fallback: bool = False,
         fallback_note: str = "", **cfg_overrides) -> None:
    """Zero-shot transfer RTF at ``batch`` concurrent utterances (batch>1 =
    BASELINE config 5 serving throughput; reported per utterance).
    ``cfg_overrides`` are forwarded to load_config (e.g. pndm_speedup=5)."""
    import jax

    from stylesinger_tpu.utils.backend import enable_compile_cache

    # persistent compile cache: repeated bench runs skip the ~15 min
    # full-model compile
    enable_compile_cache(CACHE_DIR)
    if cpu_fallback:
        # the env-derived platform is locked by the axon sitecustomize;
        # override at the config level (same mechanism as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from stylesinger_tpu.config import load_config
    from stylesinger_tpu.models.hifigan import HifiGanGenerator
    from stylesinger_tpu.models.stylesinger import StyleSinger

    vocab = 64
    # ~5.5 s of 48 kHz audio at hop 256; a small buffer on the CPU
    # fallback so the run stays inside any driver budget
    frames = 256 if cpu_fallback else 1024
    cfg = load_config(max_frames=frames, max_input_tokens=128,
                      vocoder_compute_dtype="bfloat16", **cfg_overrides)
    hop = cfg["hop_size"]
    sr = cfg["audio_sample_rate"]

    model = StyleSinger(cfg, vocab)
    voc = HifiGanGenerator(cfg)

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    b, t_txt, t_ref = batch, 96, (128 if cpu_fallback else 512)
    # Ground-truth alignment derived from the note durations (the SVS score
    # fixes frame counts; the model accepts mel2ph at inference exactly like
    # the reference's teacher-forced path). Notes split the buffer evenly so
    # every frame is content: content_fill = 1 and content-RTF == buffer-RTF
    # (VERDICT r3 weak #1: random-weight duration predictors emit ~0 frames,
    # collapsing content_fill to 0.037 and making the headline a padded
    # number).
    dur_frames = np.full(t_txt, frames // t_txt, np.int32)
    dur_frames[: frames - int(dur_frames.sum())] += 1
    mel2ph = np.tile(np.repeat(np.arange(1, t_txt + 1, dtype=np.int32),
                               dur_frames)[None], (b, 1))
    note_dur = np.tile((dur_frames.astype(np.float32) * hop / sr)[None],
                       (b, 1))
    inp = dict(
        txt_tokens=jax.random.randint(ks[0], (b, t_txt), 1, vocab),
        mel2ph=mel2ph,
        spk_embed=jax.random.normal(ks[1], (b, 256)),
        emo_embed=jax.random.normal(ks[2], (b, 256)),
        ref_mels=jax.random.normal(
            ks[3], (b, t_ref, cfg["audio_num_mel_bins"])) * 0.5 - 2.0,
        ref_f0=jax.random.uniform(ks[4], (b, t_ref), minval=7.0, maxval=9.0),
        note=jax.random.randint(ks[5], (b, t_txt), 40, 80),
        note_dur=note_dur,
        note_type=np.ones((b, t_txt), np.int32),
    )

    rngs = {name: jax.random.PRNGKey(i) for i, name in enumerate(
        ["params", "dropout", "umln", "rq", "diffusion"])}
    # init through the TRAIN path (inference-path init would create params
    # inside lax.scan and leak tracers)
    import jax.numpy as jnp
    variables = model.init(
        rngs, inp["txt_tokens"], jnp.ones((b, t_ref), jnp.int32),
        inp["spk_embed"], inp["emo_embed"], inp["ref_mels"], inp["ref_f0"],
        jnp.full((b, t_ref), 8.0), jnp.zeros((b, t_ref)), inp["note"],
        inp["note_dur"], inp["note_type"], infer=False, use_rq=True,
        forcing=False, use_diff=True)
    mel_probe = jax.random.normal(
        ks[7], (b, frames, cfg["audio_num_mel_bins"]))
    voc_vars = voc.init({"params": k, "noise": k}, mel_probe,
                        jnp_full((b, frames), 220.0))

    @jax.jit
    def synthesize(variables, voc_vars, inp, rng):
        ret = model.apply(
            variables, inp["txt_tokens"], inp["mel2ph"], inp["spk_embed"],
            inp["emo_embed"], inp["ref_mels"], inp["ref_f0"], None, None,
            inp["note"], inp["note_dur"], inp["note_type"],
            infer=True, use_diff=True, max_frames=frames,
            rngs={"diffusion": rng, "rq": rng})
        wav = voc.apply(voc_vars, ret["mel_out"], ret["f0_denorm"],
                        rngs={"noise": rng})
        return wav

    rng = jax.random.PRNGKey(42)
    wav = synthesize(variables, voc_vars, inp, rng)  # compile
    float(wav.sum())  # host fetch = true completion barrier

    # On a tunneled device block_until_ready can return before execution
    # finishes; a host fetch is the only honest barrier. Amortize one fetch
    # (and its RTT) over n_iter queued executions (FIFO per device).
    probe = jax.jit(lambda v: v * 2)
    xs = jnp_full((8, 128), 1.0)
    float(probe(xs).sum())
    t0 = time.perf_counter()
    for _ in range(5):
        float(probe(xs).sum())
    rtt = (time.perf_counter() - t0) / 5

    n_iter = 1 if cpu_fallback else 10
    t0 = time.perf_counter()
    out = None
    for i in range(n_iter):
        out = synthesize(variables, voc_vars, inp,
                         jax.random.fold_in(rng, i))
    float(out.sum())
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n_iter
    wav = out

    # content-RTF (headline): only real frames (mel2ph > 0) count — what a
    # synthesized utterance actually pays. buffer-RTF: the full padded
    # static buffer counts (diffusion cost scales with the buffer, not the
    # content) — the serving-capacity companion number. With score-derived
    # GT mel2ph the buffer is 100% content, so the two coincide.
    wav_sec = wav.shape[-1] / sr * wav.shape[0]
    content_frames = float((mel2ph > 0).sum())
    content_sec = max(content_frames * hop / sr, 1e-9)
    buffer_rtf = dt / wav_sec
    content_rtf = dt / content_sec
    row = {
        "metric": metric, "value": round(content_rtf, 5),
        "unit": "sec/wav-sec", "vs_baseline": round(0.05 / content_rtf, 3),
        "buffer_rtf": round(buffer_rtf, 5),
        "content_fill": round(content_sec / wav_sec, 3),
        "backend": jax.default_backend()}
    if cpu_fallback:
        row["note"] = fallback_note or (
            "TPU tunnel unavailable (dead, or held by a long training "
            "job — single-client tunnel) at bench time; reduced CPU-host "
            "fallback measurement — NOT comparable to the TPU baseline. "
            "Tracked same-round TPU measurement: "
            "results/bench_r4_chain.json")
    print(json.dumps(row))


def _check_child_backend(out: dict, field: str, sub: dict,
                         expect_backend: str) -> None:
    """Flag a probe whose child ran on a different backend than the
    headline (the single-client tunnel can die BETWEEN children, silently
    dropping a later probe to CPU; an unmarked CPU number next to a TPU
    headline would corrupt the serving latency menu)."""
    got = sub.get("backend", "")
    if expect_backend and got and got != expect_backend:
        out[f"{field}_backend"] = got
        out[f"{field}_note"] = (
            f"measured on {got} while the headline ran on "
            f"{expect_backend} — NOT comparable (tunnel dropped "
            "mid-bench?)")


def _extra_rtf_row(field: str, overrides: dict, expect_backend: str = "",
                   timeout: float = 1800.0) -> dict:
    """Measure one fast-serving configuration (e.g. PLMS-5 + strided F0,
    or DPM-Solver++ 10-NFE) in a time-boxed child so the driver's BENCH
    record carries the quality-gated fast paths too (STATUS round-2/4
    gates; previously builder-reported only). Child process = the
    single-client tunnel is free again once the previous bench exits."""
    from stylesinger_tpu.utils.backend import run_json_child

    env = dict(os.environ, BENCH_INNER="1",
               BENCH_OVERRIDES=json.dumps(overrides))
    sub, note = run_json_child(
        [sys.executable, os.path.abspath(__file__)], env=env,
        timeout=timeout)
    if sub is None:
        return {f"{field}_note": note}
    out = {field: sub["value"], f"{field}_vs_baseline": sub["vs_baseline"]}
    _check_child_backend(out, field, sub, expect_backend)
    return out


def _train_throughput_row(expect_backend: str = "",
                          timeout: float = 2700.0) -> dict:
    """Time-boxed flagship train-step throughput (bench_train.py) so the
    driver's BENCH record carries a verifiable training number too
    (VERDICT r3 weak #7). Returns extra fields for the headline row."""
    from stylesinger_tpu.utils.backend import run_json_child

    tr, note = run_json_child(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_train.py"), "float32"],
        timeout=timeout)
    if tr is None:
        return {"train_note": f"bench_train {note}"}
    out = {"train_steps_per_sec": tr["value"],
           "train_realtime_factor": tr["vs_baseline"]}
    _check_child_backend(out, "train_steps_per_sec", tr, expect_backend)
    return out


def jnp_full(shape, value):
    import jax.numpy as jnp
    return jnp.full(shape, value, jnp.float32)


def run_resilient() -> None:
    """Never exit nonzero without printing a JSON line, and never blow the
    global deadline: probe the device backend out-of-process, run the real
    bench on any HEALTHY backend (accelerator or genuine CPU-only box — a
    healthy 'cpu' probe gets the full documented workload, not the
    fallback), enrich with the fast-serving and train-throughput rows only
    while the remaining budget allows, and fall back to a clearly-flagged
    reduced CPU-host measurement only when backend init hangs or errors
    (round-2 postmortem: rc=1, no metric; round-4 postmortem: fixed child
    time-boxes summed past the driver's own timeout — rc=124, no metric).

    Deadline insurance: the headline row is recorded the moment it is
    measured, and a SIGTERM/SIGINT from an outer timeout emits the best
    row captured so far before exiting — a driver kill mid-enrichment
    still records a valid measurement."""
    from stylesinger_tpu.utils.backend import probe_device_backend

    if os.environ.get("BENCH_INNER") == "1":
        main(**json.loads(os.environ.get("BENCH_OVERRIDES", "{}")))
        return

    best_row: dict = {}

    def _emit_on_kill(signum, frame):
        if best_row:
            print(json.dumps(best_row), flush=True)
            sys.stderr.write(f"| bench: signal {signum} at "
                             f"{time.monotonic() - _T0:.0f}s; emitted the "
                             "headline measured so far\n")
            os._exit(0)
        sys.stderr.write(f"| bench: signal {signum} before any "
                         "measurement\n")
        os._exit(1)

    signal.signal(signal.SIGTERM, _emit_on_kill)
    signal.signal(signal.SIGINT, _emit_on_kill)

    seed_compile_cache()
    backend = probe_device_backend(
        timeout_s=int(min(240, max(60, _remaining() * 0.15))),
        attempts=1 if _remaining() < 1500 else 2)
    if backend == "cpu":
        # healthy CPU-only box (no tunnel armed): the full 1024-frame /
        # 10-iter workload is hours on host cores — measure the reduced
        # config with an HONEST label (not the dead-tunnel note)
        sys.stderr.write("| healthy cpu-only backend; reduced config\n")
        main(cpu_fallback=True, fallback_note=(
            "no accelerator backend on this host; reduced CPU "
            "configuration — NOT comparable to the TPU baseline"))
        return
    if backend:
        import subprocess
        env = dict(os.environ, BENCH_INNER="1")
        # reserve ~5 min for the CPU-fallback path should the device
        # headline fail; a warm-cache headline needs ~3-6 min, a cold
        # compile takes what it takes (the seed should prevent that)
        inner_budget = max(420.0, _remaining() - 300.0)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=inner_budget, text=True,
                               capture_output=True)
            sys.stderr.write(r.stderr[-2000:])
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")), None)
            if r.returncode == 0 and line:
                # headline landed: record it (SIGTERM insurance), then
                # enrich within the remaining budget. Probes run AFTER the
                # inner process exits: a live jax client would hold the
                # single-client tunnel and a child's backend init would
                # hang until its timeout.
                row = json.loads(line)
                best_row.update(row)
                hb = row.get("backend", backend)
                # quality-gated fast serving paths (results/
                # acoustic_320k_fast_sampler_gates.json): PLMS-5 mel +
                # strided F0, and DPM-Solver++(2M) 10-NFE + strided F0
                extras = [
                    ("fast_rtf", lambda b: _extra_rtf_row(
                        "fast_rtf", {"pndm_speedup": 5, "f0_speedup": 5},
                        expect_backend=hb, timeout=b)),
                    ("dpm10_rtf", lambda b: _extra_rtf_row(
                        "dpm10_rtf", {"dpm_steps": 10, "f0_speedup": 5},
                        expect_backend=hb, timeout=b)),
                    ("train", lambda b: _train_throughput_row(
                        expect_backend=hb, timeout=b)),
                ]
                for name, probe in extras:
                    budget = _remaining() - 60.0
                    if budget < 240.0:
                        row[f"{name}_note"] = (
                            f"skipped: {_remaining():.0f}s left of the "
                            f"{DEADLINE_S:.0f}s bench budget")
                        continue
                    row.update(probe(budget))
                    best_row.update(row)
                print(json.dumps(row), flush=True)
                return
            sys.stderr.write(f"| device bench rc={r.returncode}; "
                             "falling back to reduced CPU config\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"| device bench hung > {inner_budget:.0f}s; "
                             "falling back to reduced CPU config\n")
    else:
        sys.stderr.write("| no healthy device backend; CPU fallback\n")
    main(cpu_fallback=True)


if __name__ == "__main__":
    sys.exit(run_resilient())
