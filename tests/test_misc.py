"""Tests for the small utility layers: multiprocess runner, wav-processor
registry, and the ESPnet relative-position encoder option."""

import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.data.preprocess import REGISTERED_WAV_PROCESSORS
from stylesinger_tpu.utils.multiprocess import multiprocess_run

KEY = jax.random.PRNGKey(0)


# -------------------------------------------------------- multiprocess

def _square(x):
    return x * x


def _boom(x):
    raise RuntimeError("boom")


def test_multiprocess_run_inprocess_order():
    out = list(multiprocess_run(_square, [(i,) for i in range(6)],
                                num_workers=1))
    assert out == [(i, i * i) for i in range(6)]


def test_multiprocess_run_pool_order():
    out = list(multiprocess_run(_square, [(i,) for i in range(8)],
                                num_workers=2))
    assert out == [(i, i * i) for i in range(8)]


def test_multiprocess_run_error_yields_none():
    out = list(multiprocess_run(_boom, [(1,)], num_workers=1))
    assert out == [(0, None)]


# ------------------------------------------------------ wav processors

def test_wav_processor_registry_names():
    for name in ("trim_sil", "norm_volume", "denoise"):
        assert name in REGISTERED_WAV_PROCESSORS, name


def test_norm_volume_hits_target():
    sr = 24000
    wav = 0.01 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
    out = REGISTERED_WAV_PROCESSORS["norm_volume"](wav, sr)
    rms_dbfs = 20 * np.log10(np.sqrt((out ** 2).mean()))
    assert abs(rms_dbfs - (-30.0)) < 0.5


def test_trim_sil_removes_padding():
    sr = 24000
    tone = 0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
    wav = np.concatenate([np.zeros(sr), tone, np.zeros(sr)]).astype(
        np.float32)
    out = REGISTERED_WAV_PROCESSORS["trim_sil"](wav, sr)
    assert len(out) < len(wav) * 0.6


def test_denoise_processor_reduces_noise_floor():
    sr = 24000
    rng = np.random.default_rng(0)
    tone = 0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
    noisy = (tone + 0.005 * rng.standard_normal(sr)).astype(np.float32)
    out = REGISTERED_WAV_PROCESSORS["denoise"](noisy, sr)
    assert out.shape == noisy.shape
    # residual vs the clean tone should shrink
    n = min(len(out), len(tone))
    before = float(((noisy[:n] - tone[:n]) ** 2).mean())
    after = float(((out[:n] - tone[:n]) ** 2).mean())
    assert after < before


# ---------------------------------------------------------- mfa inputs

def test_build_mfa_inputs(tmp_path):
    import os
    import wave
    from stylesinger_tpu.config import tiny_test_config
    from stylesinger_tpu.data.preprocess import Preprocessor

    sr = 24000
    wav_fn = str(tmp_path / "u0.wav")
    pcm = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
           * 32767).astype(np.int16)
    with wave.open(wav_fn, "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    rows = [{"item_name": "u0", "ph": ["a", "b"], "singer": "s1",
             "wav_fn": wav_fn},
            {"item_name": "u1", "ph": "c d", "singer": "s2"}]
    pre = Preprocessor(tiny_test_config(), language="en")
    mfa_dir = pre.build_mfa_inputs(rows, out_dir=str(tmp_path))
    assert os.path.exists(os.path.join(mfa_dir, "s1", "u0.lab"))
    assert os.path.exists(os.path.join(mfa_dir, "s1", "u0.wav"))
    assert open(os.path.join(mfa_dir, "s2", "u1.lab")).read() == "c d"
    dict_lines = open(str(tmp_path / "mfa_dict.txt")).read().splitlines()
    assert "a a" in dict_lines and "d d" in dict_lines


# ----------------------------------------------------------- profiling

def test_profile_step_returns_op_table(tmp_path):
    from stylesinger_tpu.utils.profiling import format_table, profile_step
    f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
    x = jnp.ones((128, 128))
    float(f(x))  # compile outside the trace
    rows = profile_step(lambda: f(x), iters=2, trace_dir=str(tmp_path))
    assert rows, "no ops parsed from the trace"
    assert {"name", "total_us", "count", "per_iter_us"} <= set(rows[0])
    table = format_table(rows, top=3)
    assert "ms" in table


# ------------------------------------------------------------- rel_pos

def test_encoder_rel_pos_variant(tiny_cfg):
    """`rel_pos: true` swaps in the ESPnet relative-position table
    (reference modules/commons/espnet_positional_embedding.py) — the
    encoder must still run and produce a different embedding than the
    default sinusoidal path."""
    from stylesinger_tpu.models.common import FastspeechEncoder
    vocab, b, t = 16, 2, 12
    tokens = jax.random.randint(KEY, (b, t), 1, vocab)
    h = tiny_cfg["hidden_size"]
    outs = {}
    for rel in (False, True):
        enc = FastspeechEncoder(
            vocab_size=vocab, hidden_size=h,
            num_layers=tiny_cfg["enc_layers"],
            kernel_size=tiny_cfg["enc_ffn_kernel_size"],
            num_heads=tiny_cfg["num_heads"], rel_pos=rel)
        v = enc.init({"params": KEY, "dropout": KEY}, tokens,
                     deterministic=True)
        outs[rel] = np.asarray(
            enc.apply(v, tokens, deterministic=True))
        assert outs[rel].shape == (b, t, h)
        assert np.isfinite(outs[rel]).all()
    assert np.abs(outs[True] - outs[False]).max() > 1e-4


def test_metrics_writer_media(tmp_path):
    import os
    """TensorBoard media export (VERDICT r1 #10): scalars + images + audio
    land in event files under <work_dir>/tb."""
    import numpy as np

    from stylesinger_tpu.training.trainer import MetricsWriter

    mw = MetricsWriter(str(tmp_path))
    mw.write(10, {"loss": 1.0})
    mw.write_image("valid/mel", np.zeros((8, 8, 3), np.uint8), 10)
    mw.write_audio("valid/wav", np.zeros(100, np.float32), 10, 24000)
    mw.close()
    tb = os.path.join(str(tmp_path), "tb")
    events = [f for f in os.listdir(tb) if "tfevents" in f]
    assert events, "no event files written"
    assert sum(os.path.getsize(os.path.join(tb, f)) for f in events) > 350


def test_fit_bucket():
    from stylesinger_tpu.inference import _fit_bucket

    assert _fit_bucket(100, (64, 128, 256)) == 128
    assert _fit_bucket(64, (64, 128)) == 64
    assert _fit_bucket(300, (64, 128, 256)) == 300
    assert _fit_bucket(5, ()) == 5


def test_meta_adapters(tmp_path):
    """Dataset meta-data adapters mirror the reference pre_align classes
    (egs/datasets/audio/{lj,emotion,libritts,vctk}/pre_align.py)."""
    from stylesinger_tpu.data.preprocess import load_meta_data

    # LJ layout
    lj = tmp_path / "lj"
    (lj / "wavs").mkdir(parents=True)
    (lj / "metadata.csv").write_text(
        "LJ001-0001|raw text|Printing, then.\nLJ001-0002|r|Second line.\n")
    rows = load_meta_data("lj", str(lj))
    assert [r["item_name"] for r in rows] == ["LJ001-0001", "LJ001-0002"]
    assert rows[0]["txt"] == "Printing, then."
    assert rows[0]["spk_name"] == "SPK1"
    assert rows[0]["wav_fn"].endswith("wavs/LJ001-0001.wav")

    # ESD/emotion layout
    emo = tmp_path / "emo"
    (emo / "0011" / "Happy").mkdir(parents=True)
    (emo / "0011" / "0011.txt").write_text(
        "0011_000001\tThe text here\tHappy\n")
    rows = load_meta_data("emotion", str(emo))
    assert rows[0]["item_name"] == "0011_000001"
    assert rows[0]["emotion"] == "Happy"
    assert rows[0]["txt"] == "The text here"
    assert rows[0]["wav_fn"].endswith("0011/Happy/0011_000001.wav")

    # LibriTTS layout
    lt = tmp_path / "libritts" / "103" / "1241"
    lt.mkdir(parents=True)
    (lt / "103_1241_000000_000001.wav").write_bytes(b"")
    (lt / "103_1241_000000_000001.normalized.txt").write_text(
        "matthew Cuthbert is surprised\n")
    rows = load_meta_data("libritts", str(tmp_path / "libritts"))
    assert rows[0]["spk_name"] == "103"
    assert rows[0]["txt"] == "matthew Cuthbert is surprised"

    # VCTK layout
    vc = tmp_path / "vctk"
    (vc / "wav48" / "p225").mkdir(parents=True)
    (vc / "txt" / "p225").mkdir(parents=True)
    (vc / "wav48" / "p225" / "p225_001.wav").write_bytes(b"")
    (vc / "txt" / "p225" / "p225_001.txt").write_text("Please call Stella.\n")
    rows = load_meta_data("vctk", str(vc))
    assert rows[0]["item_name"] == "p225_001"
    assert rows[0]["spk_name"] == "p225"
    assert rows[0]["txt"] == "Please call Stella."


def test_host_only_children_env_contract():
    """Pool workers must spawn with remote-PJRT registration disarmed and
    JAX_PLATFORMS=cpu, and the parent env must be restored afterwards
    (regression: spawn children wedged at startup under a dead tunnel)."""
    import os

    from stylesinger_tpu.utils.multiprocess import host_only_children

    os.environ["PALLAS_AXON_POOL_IPS"] = "10.0.0.1"
    prev_platforms = os.environ.get("JAX_PLATFORMS")
    try:
        with host_only_children():
            assert "PALLAS_AXON_POOL_IPS" not in os.environ
            assert os.environ["JAX_PLATFORMS"] == "cpu"
        assert os.environ["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"
        assert os.environ.get("JAX_PLATFORMS") == prev_platforms
    finally:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        if prev_platforms is not None:
            os.environ["JAX_PLATFORMS"] = prev_platforms


def test_emotion_adapter_no_trailing_newline(tmp_path):
    """Review r3: the ESD slicing must survive a final line without \\n."""
    from stylesinger_tpu.data.preprocess import load_meta_data

    emo = tmp_path / "emo2"
    (emo / "0011" / "Happy").mkdir(parents=True)
    (emo / "0011" / "0011.txt").write_text(
        "0011_000001\tThe text here\tHappy")  # no trailing newline
    rows = load_meta_data("emotion", str(emo))
    assert rows[0]["emotion"] == "Happy"
    assert rows[0]["txt"] == "The text here"


def test_preprocess_cli(tmp_path, monkeypatch):
    """run.py preprocess: LJ adapter -> metadata.json + phone_set.json +
    (--mfa) the MFA corpus layout (reference data_gen/tts/bin/preprocess.py
    + train_mfa_align.py)."""
    import json
    import sys
    import wave

    import numpy as np

    from stylesinger_tpu import run as cli

    raw = tmp_path / "raw"
    (raw / "wavs").mkdir(parents=True)
    with open(raw / "metadata.csv", "w") as f:
        f.write("item1|raw|hello world\nitem2|raw|singing test\n")
    for name in ("item1", "item2"):
        with wave.open(str(raw / "wavs" / f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            w.writeframes(np.zeros(2400, np.int16).tobytes())

    out = tmp_path / "processed"
    overrides = ",".join([
        f"raw_data_dir={raw}", "pre_align_cls=lj", "language=en",
        f"processed_data_dir={out}",
    ])
    monkeypatch.setattr(sys, "argv", [
        "run", "preprocess", "--hparams", overrides, "--mfa"])
    cli.main()

    rows = json.load(open(out / "metadata.json"))
    assert len(rows) == 2 and rows[0]["ph"]
    phones = json.load(open(out / "phone_set.json"))
    assert set(rows[0]["ph"]) <= set(phones)
    # MFA layout: one group dir per speaker with .lab/.wav pairs + dict
    assert (out / "mfa_inputs" / "SPK1" / "item1.lab").exists()
    assert (out / "mfa_inputs" / "SPK1" / "item1.wav").exists()
    assert (out / "mfa_dict.txt").exists()
