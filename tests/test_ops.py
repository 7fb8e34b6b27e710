"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.mel import wav2mel
from stylesinger_tpu.ops import mel_spectrogram


def test_mel_pallas_matches_xla(rng):
    wav = rng.standard_normal(48000).astype(np.float32) * 0.3
    ref = np.asarray(wav2mel(jnp.asarray(wav)))
    ours = np.asarray(mel_spectrogram(jnp.asarray(wav), interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=2e-3)


def test_mel_pallas_small_input(rng):
    wav = rng.standard_normal(2048).astype(np.float32)
    out = np.asarray(mel_spectrogram(
        jnp.asarray(wav), sample_rate=24000, n_fft=512, hop_size=128,
        win_length=512, n_mels=40, fmax=12000, interpret=True))
    ref = np.asarray(wav2mel(jnp.asarray(wav), sample_rate=24000, n_fft=512,
                             hop_size=128, win_length=512, n_mels=40,
                             fmax=12000.0))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=2e-3)
