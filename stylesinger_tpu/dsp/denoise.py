"""Spectral-subtraction denoiser for vocoded audio.

Parity target: ``vocoders/vocoder_utils.py:7-15`` in AaronZ345/StyleSinger
(the ``denoise`` helper applied after HiFi-GAN when
``vocoder_denoise_c > 0``): subtract a constant noise floor from the STFT
magnitude and resynthesize with the original phase.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.griffin_lim import istft
from stylesinger_tpu.dsp.mel import _hann_periodic, frame_signal


def denoise(wav: jnp.ndarray, c: float = 0.01, *, n_fft: int = 1024,
            hop_size: int = 256, win_length: int = 1024) -> jnp.ndarray:
    """Subtract a constant magnitude floor ``c`` (phase preserved)."""
    window = np.asarray(_hann_periodic(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(wav, n_fft, hop_size)
    spec = jnp.fft.rfft(frames * jnp.asarray(window), n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    phase = spec / jnp.maximum(mag, 1e-8)
    mag = jnp.maximum(mag - c, 0.0)
    out = istft(mag * phase, n_fft, hop_size, win_length)
    return out[: wav.shape[-1]]
