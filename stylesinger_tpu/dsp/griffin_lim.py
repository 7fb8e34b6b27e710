"""Griffin-Lim phase reconstruction (mel/linear -> wav without a vocoder).

Parity target: the librosa-based Griffin-Lim in the reference's DSP misc
layer (``utils/audios/griffin_lim.py``, SURVEY.md §2.2) used as a
no-checkpoint fallback vocoder.  Implemented as a fixed-iteration
``lax.scan`` of ISTFT->STFT projections — fully jittable, so it can run
batched on the TPU rather than per-utterance on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.mel import (
    _hann_periodic, frame_signal, mel_filterbank,
)


def _window(n_fft: int, win_length: int) -> np.ndarray:
    w = _hann_periodic(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    return w


def istft(spec: jnp.ndarray, n_fft: int, hop_size: int,
          win_length: int) -> jnp.ndarray:
    """Overlap-add inverse STFT of [N, F] complex -> [T] (centered)."""
    window = jnp.asarray(_window(n_fft, win_length))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # [N, W]
    n = frames.shape[0]
    t = (n - 1) * hop_size + n_fft
    idx = jnp.arange(n)[:, None] * hop_size + jnp.arange(n_fft)[None, :]
    wav = jnp.zeros((t,)).at[idx.reshape(-1)].add(frames.reshape(-1))
    wsq = jnp.zeros((t,)).at[idx.reshape(-1)].add(
        jnp.broadcast_to(window ** 2, frames.shape).reshape(-1))
    wav = wav / jnp.maximum(wsq, 1e-8)
    pad = n_fft // 2
    return wav[pad: t - pad]


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_length",
                                   "n_iters"))
def griffin_lim(mag: jnp.ndarray, *, n_fft: int = 1024, hop_size: int = 256,
                win_length: int = 1024, n_iters: int = 30) -> jnp.ndarray:
    """|STFT| magnitude [N, F] -> waveform [T] via iterative phase fitting."""
    window = jnp.asarray(_window(n_fft, win_length))

    def stft(wav):
        frames = frame_signal(wav, n_fft, hop_size)[: mag.shape[0]]
        return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)

    rng = jax.random.PRNGKey(0)
    angles = jnp.exp(2j * jnp.pi * jax.random.uniform(rng, mag.shape))

    def step(angles, _):
        wav = istft(mag * angles, n_fft, hop_size, win_length)
        s = stft(wav)
        angles = s / jnp.maximum(jnp.abs(s), 1e-8)
        return angles, None

    angles, _ = jax.lax.scan(step, angles, None, length=n_iters)
    return istft(mag * angles, n_fft, hop_size, win_length)


def mel_to_linear(mel_log10: jnp.ndarray, *, sample_rate: int = 48000,
                  n_fft: int = 1024, n_mels: int = 80, fmin: float = 20.0,
                  fmax: float = 24000.0) -> jnp.ndarray:
    """log10-mel [N, M] -> approximate |STFT| [N, F] via NNLS-ish pinv."""
    basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)  # [M, F]
    inv = np.linalg.pinv(basis)                                     # [F, M]
    mel = 10.0 ** mel_log10
    return jnp.maximum(mel @ jnp.asarray(inv.T.astype(np.float32)), 1e-8)
