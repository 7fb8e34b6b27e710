"""STFT + mel spectrogram, self-contained and librosa-compatible.

Behavioral parity target: ``librosa_wav2spec`` in the reference
(``utils/audios/__init__.py:36-84``): centered STFT (fft 1024 / hop 256 /
win 1024, periodic hann, constant zero padding), Slaney-mel filterbank
(80 bins, fmin 20, fmax 24000 @ 48 kHz), ``log10(max(1e-6, mel))``, and the
wav re-padded to ``n_frames * hop`` samples.

The JAX path frames the signal with a gather and runs one batched rfft —
XLA lowers this to the TPU's native FFT; the mel projection is a single
[F, M] matmul on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney-style, matches librosa.filters.mel defaults)
# ---------------------------------------------------------------------------

def _hz_to_mel(freqs: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    freqs = np.asarray(freqs, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freqs / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freqs >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep,
                    mels)
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region,
                     min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                     freqs)
    return freqs


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float) -> np.ndarray:
    """Triangular mel filterbank [n_mels, 1 + n_fft//2], Slaney-normalized."""
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)),
                          n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: equal area per band
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann_periodic(win_length: int) -> np.ndarray:
    """Periodic Hann window (scipy get_window('hann', N, fftbins=True))."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


# ---------------------------------------------------------------------------
# JAX path
# ---------------------------------------------------------------------------

def frame_signal(wav: jnp.ndarray, n_fft: int, hop_size: int) -> jnp.ndarray:
    """Center-pad (constant zeros) and frame [..., T] -> [..., N, n_fft].

    When ``n_fft`` is a multiple of ``hop_size`` (the 1024/256 default),
    framing is k contiguous slices of a [..., nb, hop] reshape concatenated
    on the last axis — pure data movement.  TPU gathers with a [N, n_fft]
    index matrix are orders of magnitude slower.
    """
    pad = n_fft // 2
    wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)])
    t = wav.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_size
    if n_fft % hop_size == 0:
        k = n_fft // hop_size
        nb = n_frames - 1 + k
        blocks = wav[..., : nb * hop_size].reshape(
            wav.shape[:-1] + (nb, hop_size))
        return jnp.concatenate(
            [blocks[..., i: i + n_frames, :] for i in range(k)], axis=-1)
    idx = (jnp.arange(n_frames)[:, None] * hop_size + jnp.arange(n_fft)[None, :])
    return wav[..., idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_length"))
def stft_magnitude(wav: jnp.ndarray, n_fft: int = 1024, hop_size: int = 256,
                   win_length: int = 1024) -> jnp.ndarray:
    """|STFT| of [..., T] -> [..., N, 1 + n_fft//2]. Centered, zero-padded."""
    frames = frame_signal(wav, n_fft, hop_size)
    window = jnp.asarray(_hann_periodic(win_length))
    if win_length < n_fft:  # center window inside the fft frame
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.abs(spec)


def wav2mel(wav: jnp.ndarray, *, sample_rate: int = 48000, n_fft: int = 1024,
            hop_size: int = 256, win_length: int = 1024, n_mels: int = 80,
            fmin: float = 20.0, fmax: float = 24000.0,
            eps: float = 1e-6,
            mel_basis: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """log10-mel spectrogram of [..., T] -> [..., N, n_mels] (JAX, jit-able)."""
    if mel_basis is None:
        mel_basis = jnp.asarray(
            mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mag = stft_magnitude(wav, n_fft, hop_size, win_length)
    mel = jnp.einsum("...tf,mf->...tm", mag, mel_basis,
                     preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(eps, mel))


def pad_wav_to_frames(wav: np.ndarray, hop_size: int) -> np.ndarray:
    """Right-pad wav so len == n_frames * hop (reference ``librosa_pad_lr`` +
    truncation, ``utils/audios/__init__.py:9-17,80-81``)."""
    n_frames = len(wav) // hop_size + 1
    pad = n_frames * hop_size - len(wav)
    return np.pad(wav, (0, pad), mode="constant")


# ---------------------------------------------------------------------------
# numpy twin (offline binarizer + golden reference for tests)
# ---------------------------------------------------------------------------

def wav2spec_np(wav: Union[str, np.ndarray], *, sample_rate: int = 48000,
                n_fft: int = 1024, hop_size: int = 256, win_length: int = 1024,
                n_mels: int = 80, fmin: float = 20.0, fmax: float = 24000.0,
                eps: float = 1e-6, loud_norm: bool = False) -> dict:
    """Offline wav -> {'wav', 'mel'} mirroring ``librosa_wav2spec`` outputs
    (incl. the optional BS.1770 loudness normalization,
    utils/audios/__init__.py:44-52)."""
    if isinstance(wav, str):
        wav = load_wav(wav, sample_rate)
    wav = np.asarray(wav, dtype=np.float32)
    if loud_norm:
        from stylesinger_tpu.dsp.loudness import normalize_loudness
        wav = normalize_loudness(wav, sample_rate, target_lufs=-23.0)

    pad = n_fft // 2
    padded = np.pad(wav, (pad, pad), mode="constant")
    n_frames = 1 + (len(padded) - n_fft) // hop_size
    strides = padded.strides[0]
    frames = np.lib.stride_tricks.as_strided(
        padded, shape=(n_frames, n_fft), strides=(hop_size * strides, strides))

    window = _hann_periodic(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    mag = np.abs(np.fft.rfft(frames * window, n=n_fft, axis=-1))

    basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    mel = np.log10(np.maximum(eps, mag @ basis.T))  # [N, n_mels]

    out_wav = pad_wav_to_frames(wav, hop_size)[: mel.shape[0] * hop_size]
    return {"wav": out_wav, "mel": mel.astype(np.float32)}


def load_wav(path: str, sample_rate: int) -> np.ndarray:
    """Minimal WAV loader (PCM16/PCM32/float32) with linear resampling."""
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    if sr != sample_rate:
        t_out = np.arange(int(round(len(data) * sample_rate / sr))) * (sr / sample_rate)
        data = np.interp(t_out, np.arange(len(data)), data).astype(np.float32)
    return data


def save_wav(wav: np.ndarray, path: str, sample_rate: int,
             norm: bool = False) -> None:
    import wave

    wav = np.asarray(wav, dtype=np.float32)
    if norm and np.abs(wav).max() > 0:
        wav = wav / np.abs(wav).max() * 0.95
    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
