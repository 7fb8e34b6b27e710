"""Auxiliary components: Griffin-Lim, VAD, DTW, denoise, PE, plots,
vocoder registry, GE2E encoders."""

import jax
import jax.numpy as jnp
import os
import numpy as np
import pytest

from stylesinger_tpu.dsp.dtw import align_from_distances, dtw_distance
from stylesinger_tpu.dsp.griffin_lim import griffin_lim, istft, mel_to_linear
from stylesinger_tpu.dsp.mel import frame_signal, wav2spec_np
from stylesinger_tpu.dsp.vad import trim_long_silences
from stylesinger_tpu.models.encoders import (
    UtteranceEncoder, compute_partial_slices, ge2e_loss, ge2e_mel_np,
)
from stylesinger_tpu.models.pe import PitchExtractor, pe_loss


def _sine(f, sr, dur):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * f * t).astype(np.float32)


# ------------------------------------------------------------ griffin-lim

def test_istft_inverts_stft(rng):
    wav = rng.standard_normal(4096).astype(np.float32) * 0.3
    frames = frame_signal(jnp.asarray(wav), 512, 128)
    from stylesinger_tpu.dsp.griffin_lim import _window
    window = jnp.asarray(_window(512, 512))
    spec = jnp.fft.rfft(frames * window, n=512, axis=-1)
    rec = np.asarray(istft(spec, 512, 128, 512))
    n = min(len(rec), len(wav))
    np.testing.assert_allclose(rec[256: n - 256], wav[256: n - 256],
                               atol=1e-3)


def test_griffin_lim_reconstructs_tone():
    sr = 24000
    wav = _sine(440.0, sr, 0.4) * 0.5
    frames = frame_signal(jnp.asarray(wav), 512, 128)
    from stylesinger_tpu.dsp.griffin_lim import _window
    window = jnp.asarray(_window(512, 512))
    mag = jnp.abs(jnp.fft.rfft(frames * window, n=512, axis=-1))
    rec = np.asarray(griffin_lim(mag, n_fft=512, hop_size=128,
                                 win_length=512, n_iters=16))
    # the reconstruction should be dominated by the same frequency
    spec = np.abs(np.fft.rfft(rec))
    assert abs(np.argmax(spec) * sr / len(rec) - 440.0) < 15.0


def test_mel_to_linear_shape():
    mel = jnp.zeros((10, 80)) - 2.0
    lin = mel_to_linear(mel)
    assert lin.shape == (10, 513)
    assert (np.asarray(lin) > 0).all()


# -------------------------------------------------------------------- vad

def test_trim_long_silences():
    sr = 16000
    voiced = _sine(220.0, sr, 0.5) * 0.5
    sil = np.zeros(sr)  # 1s silence: should be trimmed
    wav = np.concatenate([voiced, sil, voiced])
    trimmed, mask = trim_long_silences(wav, sr)
    assert len(trimmed) < len(wav) - sr // 2
    assert mask.dtype == bool and mask.shape == wav.shape


# -------------------------------------------------------------------- dtw

def test_dtw_identity_is_zeroish(rng):
    x = jnp.asarray(rng.standard_normal((20, 4)).astype(np.float32))
    d = float(dtw_distance(x, x))
    assert d < 20 * 1e-3 + 1e-3


def test_dtw_orders():
    a = jnp.asarray(np.sin(np.linspace(0, 3, 30))[:, None].astype(np.float32))
    b = jnp.asarray(np.sin(np.linspace(0, 3, 40))[:, None].astype(np.float32))
    c = jnp.asarray(np.cos(np.linspace(0, 3, 40))[:, None].astype(np.float32))
    assert float(dtw_distance(a, b)) < float(dtw_distance(a, c))


def test_align_from_distances_monotonic(rng):
    d = rng.random((8, 12)).astype(np.float32)
    path = align_from_distances(d)
    assert len(path) == 8
    assert (np.diff(path) >= 0).all()
    assert path.max() < 12


# --------------------------------------------------------------------- pe

def test_pitch_extractor(tiny_cfg):
    cfg = dict(tiny_cfg)
    m = PitchExtractor(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0),
                            (2, 24, cfg["audio_num_mel_bins"]))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, mel)
    ret = m.apply(v, mel)
    assert ret["pitch_pred"].shape == (2, 24, 2)
    f0 = jax.random.uniform(jax.random.PRNGKey(2), (2, 24), minval=7.0,
                            maxval=9.0)
    uv = jnp.zeros((2, 24))
    losses = pe_loss(ret, f0, uv, cfg)
    assert np.isfinite(float(losses["f0"]))
    assert np.isfinite(float(losses["uv"]))


# ------------------------------------------------------------------- ge2e

def test_ge2e_embed_and_loss(rng):
    wav = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    enc = UtteranceEncoder(hidden_size=32, embed_size=16)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 40)))
    # speaker path: projected, unit-norm, embed_size-dim
    e = enc.embed_utterance(v, wav, project=True)
    assert e.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-4)
    # emotion path: raw last hidden (hidden_size-dim), unit-norm after mean
    e_raw = enc.embed_utterance(v, wav, project=False)
    assert e_raw.shape == (32,)
    np.testing.assert_allclose(np.linalg.norm(e_raw), 1.0, rtol=1e-4)

    wav_slices, mel_slices = compute_partial_slices(16000 * 2)
    assert all(s.stop - s.start == 160 for s in mel_slices)
    assert all(s.stop - s.start == 160 * 160 for s in wav_slices)

    embeds = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 16))
    embeds = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
    loss = float(ge2e_loss(embeds, jnp.asarray(10.0), jnp.asarray(-5.0)))
    assert np.isfinite(loss) and loss > 0


def test_ge2e_mel_frontend():
    """Power-mel front-end matches torch.stft with librosa-0.8 semantics
    (centered reflect pad, hann 400/160, |.|^2 @ Slaney mel) — the
    resemblyzer/emotion mel is NOT log-scaled (reference audio.py:43-57)."""
    torch = pytest.importorskip("torch")
    sr = 16000
    wav = _sine(300.0, sr, 0.5) + 0.01 * np.random.default_rng(0) \
        .standard_normal(8000).astype(np.float32)
    mel = ge2e_mel_np(wav)
    assert mel.shape[1] == 40
    assert np.isfinite(mel).all() and (mel >= 0).all()

    spec = torch.stft(torch.from_numpy(wav), n_fft=400, hop_length=160,
                      window=torch.hann_window(400, periodic=True),
                      center=True, pad_mode="reflect",
                      return_complex=True)
    power = (spec.abs() ** 2).numpy().T          # [T, 201]
    from stylesinger_tpu.dsp.mel import mel_filterbank
    golden = power @ mel_filterbank(sr, 400, 40, 0.0, sr / 2).T
    assert mel.shape[0] == golden.shape[0]
    np.testing.assert_allclose(mel, golden, atol=1e-3, rtol=1e-3)


def test_resample_wav_vs_scipy():
    """Own polyphase kaiser resampler matches scipy.signal.resample_poly
    (the VERDICT-prescribed golden) for the 48k->16k and 24k->16k paths."""
    from scipy.signal import resample_poly

    from stylesinger_tpu.models.encoders import resample_wav

    rng = np.random.default_rng(3)
    for orig_sr in (48000, 24000):
        wav = rng.standard_normal(orig_sr // 2).astype(np.float32)
        ours = resample_wav(wav, orig_sr, 16000)
        golden = resample_poly(wav.astype(np.float64), 16000 // 8000,
                               orig_sr // 8000)
        assert ours.shape == golden.shape
        np.testing.assert_allclose(ours, golden, atol=5e-4)


def test_preprocess_wav_pipeline():
    from stylesinger_tpu.models.encoders import preprocess_wav

    rng = np.random.default_rng(4)
    sr = 48000
    # voiced burst surrounded by long silence: trim should shorten it
    sig = np.concatenate([
        np.zeros(sr), 0.3 * rng.standard_normal(sr).astype(np.float32),
        np.zeros(sr)]).astype(np.float32)
    out = preprocess_wav(sig, sr)
    assert out.dtype == np.float32
    assert len(out) < len(sig) * 16000 // 48000
    rms_db = 20 * np.log10(np.sqrt(np.mean(out ** 2)) + 1e-12)
    assert rms_db > -35.0          # volume-normalized toward -30 dBFS


# ---------------------------------------------------------------- vocoder

def test_vocoder_registry(tiny_cfg):
    from stylesinger_tpu.vocoder_infer import get_vocoder_cls

    cfg = dict(tiny_cfg)
    cfg["vocoder"] = "HifiGAN_NSF"
    cfg["hop_size"] = 64
    voc = get_vocoder_cls(cfg)(cfg)
    mel = np.zeros((12, cfg["audio_num_mel_bins"]), np.float32) - 2.0
    f0 = np.full(12, 220.0, np.float32)
    wav = voc.spec2wav(mel, f0=f0)
    assert wav.shape == (12 * 64,)

    cfg2 = dict(tiny_cfg)
    cfg2["vocoder"] = "GriffinLim"
    cfg2.update(fft_size=512, win_size=512, hop_size=128,
                audio_num_mel_bins=80, audio_sample_rate=24000, fmax=12000)
    voc2 = get_vocoder_cls(cfg2)(cfg2)
    wav2 = voc2.spec2wav(np.zeros((12, 80), np.float32) - 2.0)
    assert np.isfinite(wav2).all()


# ------------------------------------------------------------------- plot

def test_plot_figures():
    from stylesinger_tpu.utils.plot import (
        f0_to_figure, figure_to_image, spec_to_figure,
    )
    img = figure_to_image(spec_to_figure(np.zeros((20, 80))))
    assert img.ndim == 3 and img.shape[2] == 3
    img2 = figure_to_image(f0_to_figure(np.ones(10) * 200,
                                        f0_pred=np.ones(10) * 210))
    assert img2.ndim == 3


# ------------------------------------------------------------------- eval

def test_eer():
    from stylesinger_tpu.eval import compute_eer
    rng = np.random.default_rng(0)
    same = rng.normal(0.8, 0.1, 200)
    diff = rng.normal(0.2, 0.1, 200)
    scores = np.concatenate([same, diff])
    labels = np.concatenate([np.ones(200), np.zeros(200)])
    eer, thr = compute_eer(scores, labels)
    assert eer < 0.05
    assert 0.2 < thr < 0.8
    # random scores -> ~50%
    eer2, _ = compute_eer(rng.random(400), labels)
    assert 0.3 < eer2 < 0.7


def test_ffe_mcd():
    from stylesinger_tpu.eval import ffe, mcd
    f0 = np.array([0, 100, 200, 300, 0], float)
    assert ffe(f0, f0) == 0.0
    pred = f0.copy(); pred[1] = 150  # 50% dev
    assert abs(ffe(f0, pred) - 0.2) < 1e-6
    mel = np.random.default_rng(0).standard_normal((10, 80))
    assert mcd(mel, mel) == 0.0
    assert mcd(mel, mel + 0.1) > 0


# ------------------------------------------------------------ preprocess

def test_preprocessor(tmp_path, tiny_cfg):
    from stylesinger_tpu.data.preprocess import Preprocessor
    cfg = dict(tiny_cfg)
    cfg["processed_data_dir"] = str(tmp_path)
    pre = Preprocessor(cfg, language="zh")
    rows = pre.process([
        {"item_name": "a", "txt": "xiao jiu", "wav_fn": "a.wav",
         "singer": "s"},
        {"item_name": "b", "ph": "x iao AP", "txt": "-", "wav_fn": "b.wav",
         "singer": "s"},
    ])
    assert rows[0]["ph"] == ["x", "iao", "j", "iu"]
    assert rows[1]["ph"] == ["x", "iao", "AP"]
    import json, os
    phones = json.load(open(os.path.join(tmp_path, "phone_set.json")))
    assert "iao" in phones and "AP" in phones


# --------------------------------------------------------------- textgrid

_TG = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "word"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.1
            text = ""
        intervals [2]:
            xmin = 0.1
            xmax = 0.5
            text = "a"
        intervals [3]:
            xmin = 0.5
            xmax = 0.9
            text = "b"
        intervals [4]:
            xmin = 0.9
            xmax = 1.0
            text = ""
"""


def test_textgrid_mel2ph():
    from stylesinger_tpu.dsp.textgrid_align import (
        get_mel2ph_from_textgrid, parse_textgrid,
    )
    tiers = parse_textgrid(_TG)
    assert len(tiers) == 2 and len(tiers[1]) == 4
    sr, hop = 16000, 160  # 100 frames/sec
    mel2ph, dur = get_mel2ph_from_textgrid(
        _TG, "<SIL> a b <SIL>", 100, hop, sr)
    # 'a' spans 0.1-0.5s -> ~40 frames of index 2 (1-based after <SIL>)
    assert (mel2ph == 2).sum() in range(38, 43)
    assert (mel2ph == 3).sum() in range(38, 43)
    assert dur.sum() == 100


def test_loudness_norm():
    from stylesinger_tpu.dsp.loudness import (
        integrated_loudness, normalize_loudness,
    )
    sr = 16000
    t = np.arange(sr * 2) / sr
    wav = (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    l1 = integrated_loudness(wav, sr)
    assert -60 < l1 < -10
    out = normalize_loudness(wav, sr, target_lufs=-23.0)
    l2 = integrated_loudness(out, sr)
    assert abs(l2 - (-23.0)) < 1.0


# --------------------------------------------------------- legacy vocoders

def test_pqmf_reconstruction(rng):
    from stylesinger_tpu.models.legacy_vocoders import PQMF
    pqmf = PQMF(subbands=4)
    t = 4096
    wav = jnp.asarray(np.sin(2 * np.pi * 500 * np.arange(t) / 24000)
                      .astype(np.float32))[None]
    sub = pqmf.analysis(wav)
    assert sub.shape == (1, t // 4, 4)
    rec = np.asarray(pqmf.synthesis(sub))[0]
    # near-perfect reconstruction up to the filterbank group delay
    a = np.asarray(wav)[0]
    corr = max(np.corrcoef(a[200:-200],
                           np.roll(rec, d)[200:-200])[0, 1]
               for d in range(-128, 129))
    assert corr > 0.999
    assert abs(rec.std() / a.std() - 1.0) < 0.01  # unit gain


def test_pwg_and_melgan_generators(tiny_cfg):
    from stylesinger_tpu.models.legacy_vocoders import (
        MelGANGenerator, ParallelWaveGANGenerator,
    )
    cfg = dict(tiny_cfg)
    cfg["hop_size"] = 64
    mel = jax.random.normal(jax.random.PRNGKey(0),
                            (1, 12, cfg["audio_num_mel_bins"]))
    pwg = ParallelWaveGANGenerator(cfg, layers=6, stacks=2,
                                   residual_channels=8, gate_channels=16,
                                   skip_channels=8)
    v = pwg.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)}, mel)
    wav = pwg.apply(v, mel, rngs={"noise": jax.random.PRNGKey(2)})
    assert wav.shape == (1, 12 * 64)

    mg = MelGANGenerator(cfg, base_channels=32)
    v = mg.init({"params": jax.random.PRNGKey(0)}, mel)
    wav = mg.apply(v, mel)
    assert wav.shape == (1, 12 * 64)
    assert np.isfinite(np.asarray(wav)).all()


def test_evaluate_gen_dir(tmp_path, rng):
    from stylesinger_tpu.dsp.mel import save_wav
    from stylesinger_tpu.eval.evaluate_gen import evaluate_dir

    sr = 24000
    os.makedirs(tmp_path / "wavs", exist_ok=True)
    t = np.arange(sr) / sr
    gt = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    pred = (0.3 * np.sin(2 * np.pi * 231 * t)).astype(np.float32)  # +5%
    save_wav(gt, str(tmp_path / "wavs" / "item_0000_gt.wav"), sr)
    save_wav(pred, str(tmp_path / "wavs" / "item_0000.wav"), sr)
    out = evaluate_dir(str(tmp_path), sr=sr,
                       cfg=dict(audio_sample_rate=sr, fft_size=512,
                                hop_size=128, win_size=512,
                                audio_num_mel_bins=40, fmin=20, fmax=12000))
    assert out["n"] == 1
    assert out["mcd_mean"] > 0
    assert 0 <= out["ffe_mean"] <= 1
    assert os.path.exists(tmp_path / "metrics.json")


def test_cosine_and_speaker_cosine(rng):
    import jax

    from stylesinger_tpu.eval.metrics import cosine, speaker_cosine
    from stylesinger_tpu.models.encoders import UtteranceEncoder

    v = rng.standard_normal(64)
    assert abs(cosine(v, v) - 1.0) < 1e-9
    assert abs(cosine(v, -v) + 1.0) < 1e-9
    assert abs(cosine(v, 3.0 * v) - 1.0) < 1e-9

    # d-vector cosine: identical waveforms embed identically (cos = 1)
    # regardless of encoder weights; a different waveform moves the score.
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav_a = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_b = rng.standard_normal(2 * sr).astype(np.float32) * 0.1
    enc = UtteranceEncoder(hidden_size=32, embed_size=32, num_layers=1)
    variables = enc.init({"params": jax.random.PRNGKey(0)},
                         np.zeros((1, 160, 40), np.float32))
    same = speaker_cosine(wav_a, wav_a, sr, variables, enc)
    diff = speaker_cosine(wav_a, wav_b, sr, variables, enc)
    assert abs(same - 1.0) < 1e-5
    assert -1.0 <= diff <= 1.0 and diff < same
