"""Fused log-mel spectrogram kernel (Pallas TPU).

Replaces the reference's librosa STFT+mel front-end
(``utils/audios/__init__.py:62-79`` in AaronZ345/StyleSinger) on device.
The JAX twin in ``dsp/mel.py`` uses ``jnp.fft.rfft``; TPUs have no native
FFT unit, so XLA lowers it to a slow generic implementation.  For fixed
n_fft the real DFT is just two [W, F] matmuls — exactly what the MXU is
for — and everything around them (windowing, |.|, mel projection, log10)
is elementwise, so one Pallas kernel keeps the whole pipeline in VMEM:

    frames[N, W] --window--> w --@DFTr/@DFTi--> Xr, Xi   (MXU)
    mag = sqrt(Xr^2 + Xi^2)                               (VPU)
    mel = mag @ MelT                                      (MXU)
    out = log10(max(mel, eps))                            (VPU)

The [N, 513] magnitude never touches HBM (the XLA-FFT path materializes
it), and the DFT/mel constants stay VMEM-resident across the frame grid.

Frequency axis is padded to a lane multiple (513 -> 640); padded DFT
columns are zero so they contribute nothing to the mel projection.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.mel import (
    _hann_periodic, frame_signal, mel_filterbank,
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _constants(sample_rate: int, n_fft: int, win_length: int, n_mels: int,
               fmin: float, fmax: float):
    """(window [W], DFTr/DFTi [W, Fp], MelT [Fp, Mp]) as *device-resident*
    constants — cached as jax arrays so repeated calls don't re-upload
    ~11 MB of DFT tables (fatal over a remote-device tunnel)."""
    n_freqs = 1 + n_fft // 2
    fp = _round_up(n_freqs, 128)
    mp = _round_up(n_mels, 128)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    dft_r = np.zeros((n_fft, fp), np.float32)
    dft_i = np.zeros((n_fft, fp), np.float32)
    dft_r[:, :n_freqs] = np.cos(ang)
    dft_i[:, :n_freqs] = np.sin(ang)
    mel = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)  # [M, F]
    mel_t = np.zeros((fp, mp), np.float32)
    mel_t[:n_freqs, :n_mels] = mel.T
    window = _hann_periodic(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    return (jnp.asarray(window), jnp.asarray(dft_r), jnp.asarray(dft_i),
            jnp.asarray(mel_t))


def _mel_kernel(frames_ref, window_ref, dftr_ref, dfti_ref, melt_ref,
                out_ref, *, eps: float):
    w = frames_ref[:] * window_ref[:]
    xr = jnp.dot(w, dftr_ref[:], preferred_element_type=jnp.float32)
    xi = jnp.dot(w, dfti_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(xr * xr + xi * xi)
    mel = jnp.dot(mag, melt_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, eps))


def mel_spectrogram(wav: jnp.ndarray, *, sample_rate: int = 48000,
                    n_fft: int = 1024, hop_size: int = 256,
                    win_length: int = 1024, n_mels: int = 80,
                    fmin: float = 20.0, fmax: float = 24000.0,
                    eps: float = 1e-6, frame_tile: int = 128,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """log10-mel of wav [T] -> [N, n_mels], Pallas-fused on TPU.

    Matches ``dsp.mel.wav2mel`` numerically (same framing/window/filterbank).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    window, dft_r, dft_i, mel_t = _constants(
        sample_rate, n_fft, win_length, n_mels, fmin, fmax)
    fp = dft_r.shape[1]
    mp = mel_t.shape[1]

    frames = frame_signal(wav, n_fft, hop_size)  # [N, W]
    n = frames.shape[0]
    n_pad = _round_up(max(n, frame_tile), frame_tile)
    frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // frame_tile,)
    out = pl.pallas_call(
        functools.partial(_mel_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_pad, mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((frame_tile, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((frame_tile, mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, window, dft_r, dft_i, mel_t)
    return out[:n, :n_mels]
