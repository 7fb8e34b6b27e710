"""End-to-end pipeline tests: binarize -> dataset -> (tiny) inference."""

import contextlib
import io
import json
import os

import numpy as np
import pytest

from stylesinger_tpu.config import tiny_test_config
from stylesinger_tpu.data import StyleSingerDataset
from stylesinger_tpu.data.binarize import (
    StyleSingingBinarizer, mel2ph_from_ph_durs,
)
from stylesinger_tpu.dsp.mel import save_wav


def _write_corpus(root, rng, n=3, sr=24000):
    os.makedirs(root / "processed", exist_ok=True)
    meta = []
    for i in range(n):
        dur = 0.7
        t = np.arange(int(sr * dur)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t)).astype(
            np.float32)
        wav_fn = str(root / "processed" / f"utt_{i}.wav")
        save_wav(wav, wav_fn, sr)
        phs = ["a", "b", "c"]
        meta.append({
            "item_name": f"utt_{i}" if i else "test_utt_0",
            "ph": phs,
            "ph_durs": [dur / 3] * 3,
            "wav_fn": wav_fn,
            "singer": "s1",
            "ep_pitches": [60, 62, 64],
            "ep_notedurs": [dur / 3] * 3,
            "ep_types": [1, 1, 1],
        })
    json.dump(meta, open(root / "processed" / "metadata.json", "w"))


def test_mel2ph_from_ph_durs():
    m = mel2ph_from_ph_durs([0.1, 0.1], 40, 256, 48000)
    assert m[0] == 1
    assert m.max() == 2
    # ~18.75 frames per 0.1s
    assert abs((m == 1).sum() - 18.75) <= 1


def test_binarize_and_load(tmp_path, rng):
    cfg = tiny_test_config(
        processed_data_dir=str(tmp_path / "processed"),
        binary_data_dir=str(tmp_path / "binary"),
        audio_sample_rate=24000, fft_size=512, win_size=512, hop_size=128,
        fmax=12000, test_prefixes=["test_"], valid_prefixes=["test_"],
        max_frames=256,
    )
    # keep full-80 mel? tiny cfg uses 16 bins; the binarizer follows cfg
    _write_corpus(tmp_path, rng)
    StyleSingingBinarizer(cfg).process()

    for prefix in ("train", "valid", "test"):
        assert os.path.exists(tmp_path / "binary" / f"{prefix}.data")
    assert os.path.exists(tmp_path / "binary" / "phone_set.json")

    ds = StyleSingerDataset(cfg, "train", data_dir=str(tmp_path / "binary"))
    assert len(ds) == 2  # test_ item excluded from train
    s = ds[0]
    assert s["mels"].shape[1] == cfg["audio_num_mel_bins"]
    assert s["mel2ph"].max() == 3
    assert s["spk_embed"].shape == (256,)
    assert s["emo_embed"].shape == (256,)
    assert len(s["txt_tokens"]) == 3
    assert np.isfinite(s["f0"]).all()

    # per-dataset diffusion bounds written at binarize time, opt-in load
    import json

    from stylesinger_tpu.config import apply_spec_stats
    stats_fn = tmp_path / "binary" / "spec_stats.json"
    assert stats_fn.exists()
    stats = json.load(open(stats_fn))
    assert len(stats["spec_min"]) == cfg["audio_num_mel_bins"]
    assert all(a <= b for a, b in zip(stats["spec_min"], stats["spec_max"]))
    cfg2 = dict(cfg)
    cfg2["use_data_spec_stats"] = True
    apply_spec_stats(cfg2)
    assert cfg2["spec_min"] == stats["spec_min"]
    assert cfg2["spec_max"] == stats["spec_max"]
    assert cfg["spec_min"] != stats["spec_min"]  # opt-in only


def test_infer_api_smoke(tmp_path, rng):
    """Tiny random-weights end-to-end: ph/notes + ref wav -> wav out
    (reference input contract, inference/StyleSinger.py:182-329)."""
    sr = 24000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_fn = str(tmp_path / "ref.wav")
    save_wav(ref, ref_fn, sr)

    # hop must equal prod(upsample_rates)=64 of the tiny vocoder
    cfg = tiny_test_config(
        audio_sample_rate=sr, fft_size=512, win_size=512, hop_size=64,
        fmax=12000, max_frames=48, binary_data_dir=str(tmp_path))
    from stylesinger_tpu.inference import StyleSingerInfer

    infer = StyleSingerInfer(cfg, phone_list=["a", "b", "c"])
    infer.init_random()
    out = infer.forward_model(infer.preprocess_input({
        "ph": "a b c",
        "notes": [60, 62, 64],
        "notes_duration": [0.2, 0.2, 0.2],
        "note_types": [1, 1, 1],
        "ref_audio": ref_fn,
    }), max_frames=48)
    hop = int(np.prod(cfg["upsample_rates"]))
    assert out["wav"].ndim == 1
    assert len(out["wav"]) == out["mel"].shape[0] * hop
    assert np.isfinite(out["wav"]).all()


def test_infer_batch_and_streaming_vocoder(tmp_path, rng):
    """Batched synthesis API + chunked streaming vocoder."""
    sr = 24000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_fn = str(tmp_path / "ref.wav")
    save_wav(ref, ref_fn, sr)

    cfg = tiny_test_config(
        audio_sample_rate=sr, fft_size=512, win_size=512, hop_size=64,
        fmax=12000, max_frames=48, binary_data_dir=str(tmp_path))
    from stylesinger_tpu.inference import StyleSingerInfer

    infer = StyleSingerInfer(cfg, phone_list=["a", "b", "c"])
    infer.init_random()
    inp = {"ph": "a b c", "notes": [60, 62, 64],
           "notes_duration": [0.2, 0.2, 0.2], "note_types": [1, 1, 1],
           "ref_audio": ref_fn}
    outs = infer.infer_batch([inp, inp])
    assert len(outs) == 2
    for o in outs:
        assert o["wav"].ndim == 1
        assert np.isfinite(o["wav"]).all()

    # streaming vocoder: long mel, chunked synthesis, finite + right length
    from stylesinger_tpu.vocoder_infer import HifiGAN_NSF
    voc = HifiGAN_NSF(cfg)
    mel = rng.standard_normal((200, cfg["audio_num_mel_bins"])) \
        .astype(np.float32) * 0.2 - 2
    f0 = np.full(200, 220.0, np.float32)
    wav = voc.spec2wav_streaming(mel, f0=f0, chunk_frames=64,
                                 overlap_frames=8)
    assert wav.shape == (200 * 64,)
    assert np.isfinite(wav).all()


def test_cli_end_to_end(tmp_path, rng, monkeypatch):
    """The full user journey through run.py: binarize -> train (2 steps,
    with validation + checkpoint) -> test-split synthesis."""
    import sys

    from stylesinger_tpu import run as cli

    _write_corpus(tmp_path, rng, n=4)
    overrides = ",".join([
        "audio_sample_rate=24000", "fft_size=512", "win_size=512",
        "hop_size=128", "fmax=12000", "max_frames=256",
        f"processed_data_dir={tmp_path}/processed",
        f"binary_data_dir={tmp_path}/binary",
        "test_prefixes=[\"test_\"]", "valid_prefixes=[\"test_\"]",
        "max_updates=2", "val_check_interval=2", "tb_log_interval=1",
        "valid_infer_interval=1000000", "max_tokens=600",
        "max_sentences=4",
        # tiny dims (mirror tiny_test_config)
        "hidden_size=32", "enc_layers=1", "dec_layers=1",
        "enc_ffn_kernel_size=3", "dec_ffn_kernel_size=3",
        "predictor_layers=2", "f0_residual_layers=1",
        "f0_residual_channels=16", "residual_layers=1",
        "residual_channels=16", "timesteps=4", "K_step=4",
        "f0_timesteps=4", "f0_K_step=4", "nRQ=8", "rq_depth=2",
        "aligner_layers=1", "aligner_ffn_dim=32", "style_wn_layers=2",
        "style_conv_dilations=[1]", "audio_num_mel_bins=16",
        "keep_bins=16", "emo_size=16", "spk_embed_size=16",
        "warmup_updates=10", "frame_buckets=[128,256]",
        "token_buckets=[8,16]",
        # tiny vocoder whose upsample product equals the hop (128)
        "upsample_rates=[8,4,2,2]", "upsample_kernel_sizes=[16,8,4,4]",
        "upsample_initial_channel=16", "mrf_block=0",
    ])
    monkeypatch.setattr(sys, "argv", [
        "run", "binarize", "--hparams", overrides])
    cli.main()
    assert os.path.exists(tmp_path / "binary" / "train.data")

    monkeypatch.setattr(sys, "argv", [
        "run", "train", "--exp_name", "tiny", "--hparams", overrides,
        "--work_dir_root", str(tmp_path / "ckpts")])
    cli.main()
    work = tmp_path / "ckpts" / "tiny"
    assert os.path.exists(work / "metrics.jsonl")
    assert os.path.exists(work / "config.yaml")
    lines = [l for l in open(work / "metrics.jsonl")]
    assert len(lines) >= 2
    import json as _json
    rows = [_json.loads(l) for l in lines]
    assert any(r["prefix"] == "valid" for r in rows)
    assert all(np.isfinite(r.get("total_loss", 0.0)) for r in rows)

    # the CLI path must engage the scan dispatcher too: EpochBatches is
    # finite per pass, so _stack_batches can materialize the epoch instead
    # of draining an endless stream into the budget bail-out
    capture = io.StringIO()
    monkeypatch.setattr(sys, "argv", [
        "run", "train", "--exp_name", "tiny_spd",
        "--hparams", overrides + ",steps_per_dispatch=2",
        "--work_dir_root", str(tmp_path / "ckpts")])
    with contextlib.redirect_stdout(capture):
        cli.main()
    assert "device-resident" in capture.getvalue()
    assert os.path.exists(tmp_path / "ckpts" / "tiny_spd" / "metrics.jsonl")

    # test mode: restore the checkpoint and synthesize the test split
    monkeypatch.setattr(sys, "argv", [
        "run", "test", "--exp_name", "tiny", "--hparams", overrides,
        "--work_dir_root", str(tmp_path / "ckpts")])
    cli.main()
    gen = work / "generated_2"
    wavs = os.listdir(gen / "wavs")
    assert any(w.endswith(".wav") for w in wavs)
    assert os.path.exists(gen / "meta.csv")
    assert os.path.exists(gen / "result_f0s.npy")


def test_load_params_not_clobbered_by_infer(tmp_path, rng):
    """Advisor regression (r2 medium): load_params followed by infer must
    keep the loaded acoustic weights — the missing-encoder guard used to
    call init_random(), silently re-randomizing self.variables."""
    import jax
    import types

    sr = 24000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_fn = str(tmp_path / "ref.wav")
    save_wav(ref, ref_fn, sr)
    cfg = tiny_test_config(
        audio_sample_rate=sr, fft_size=512, win_size=512, hop_size=64,
        fmax=12000, max_frames=48, binary_data_dir=str(tmp_path))
    from stylesinger_tpu.inference import StyleSingerInfer

    infer = StyleSingerInfer(cfg, phone_list=["a", "b", "c"])
    infer._init_acoustic()
    # identity check suffices: any re-init would build NEW leaf arrays
    params = infer.variables["params"]
    state = types.SimpleNamespace(params=params,
                                  codebook=infer.variables.get(
                                      "codebook", {}))
    infer.variables = None
    infer.load_params(state)
    out = infer.forward_model(infer.preprocess_input({
        "ph": "a b c", "notes": [60, 62, 64],
        "notes_duration": [0.2, 0.2, 0.2], "note_types": [1, 1, 1],
        "ref_audio": ref_fn,
    }), max_frames=48)
    assert np.isfinite(out["wav"]).all()
    # the loaded params survived both guards (preprocess + forward)
    assert infer.variables["params"] is params


def test_load_params_refuses_empty_work_dir(tmp_path):
    """Advisor regression (r2 low): a work dir without any checkpoint must
    raise instead of silently returning random weights at step 0."""
    cfg = tiny_test_config(binary_data_dir=str(tmp_path))
    from stylesinger_tpu.inference import StyleSingerInfer

    infer = StyleSingerInfer(cfg, phone_list=["a", "b", "c"])
    with pytest.raises(FileNotFoundError):
        infer.load_params(str(tmp_path / "empty_exp"))


def test_cli_mfa_align(tmp_path, monkeypatch):
    """`run.py mfa-align` (reference data_gen/tts/bin/train_mfa_align.py):
    refuses without the preprocessed MFA corpus; with the layout present it
    shells out to the `mfa` CLI (faked here — the real aligner is not
    installable in this environment) with corpus/dict/output args."""
    import sys

    from stylesinger_tpu import run as cli

    proc = tmp_path / "processed"
    overrides = f"processed_data_dir={proc}"

    monkeypatch.setattr(sys, "argv",
                        ["run", "mfa-align", "--hparams", overrides])
    with pytest.raises(SystemExit, match="preprocess --mfa"):
        cli.main()

    (proc / "mfa_inputs" / "g0").mkdir(parents=True)
    (proc / "mfa_dict.txt").write_text("a a\n")
    fake_bin = tmp_path / "bin"
    fake_bin.mkdir()
    log = tmp_path / "mfa_args.txt"
    mfa = fake_bin / "mfa"
    mfa.write_text(f"#!/bin/sh\necho \"$@\" > {log}\n")
    mfa.chmod(0o755)
    monkeypatch.setenv("PATH", f"{fake_bin}:{os.environ['PATH']}")
    monkeypatch.setenv("N_PROC", "2")
    cli.main()
    args = log.read_text().split()
    assert args[0] == "train" and "--clean" in args
    assert str(proc / "mfa_inputs") in args
    assert str(proc / "mfa_dict.txt") in args
    assert str(proc / "mfa_outputs") in args
