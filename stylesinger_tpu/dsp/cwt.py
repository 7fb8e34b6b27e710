"""Continuous wavelet transform of log-F0 (Mexican-hat / DOG(2) mother).

Parity target: ``utils/cwt.py`` in the reference, which uses
``pycwt.wavelet.MexicanHat`` with dt=0.005, dj=1, s0=0.01, J=9 (10 dyadic
scales) plus the heuristic ``inverse_cwt`` reconstruction.  Re-implemented
with the Torrence & Compo (1998) FFT formulation so the forward transform is
a single batched rfft/irfft in JAX (no per-scale Python loop at trace time —
the scales axis is vectorized).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from scipy.special import gamma as _gamma

_DT = 0.005
_DJ = 1.0
_S0 = 2 * _DT
_J = 9
_M = 2  # DOG order (Mexican hat)


def cwt_scales(dt: float = _DT, dj: float = _DJ, s0: float = _S0,
               n_scales: int = _J + 1) -> np.ndarray:
    return s0 * 2.0 ** (dj * np.arange(n_scales))


def cont_lf0_np(f0: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Continuous log-F0: fill unvoiced gaps by interpolation, then log.

    Mirrors ``get_cont_lf0`` (``utils/cwt.py:46-50``); returns (uv, lf0).
    """
    f0 = np.asarray(f0, dtype=np.float64).copy()
    uv = (f0 == 0).astype(np.float32)
    if (f0 == 0).all():
        return uv, f0
    nz = np.where(f0 != 0)[0]
    f0[: nz[0]] = f0[nz[0]]
    f0[nz[-1]:] = f0[nz[-1]]
    nz = np.where(f0 != 0)[0]
    f0 = np.interp(np.arange(len(f0)), nz, f0[nz])
    return uv, np.log(f0)


def cwt_mexican_hat(x: jnp.ndarray, dt: float = _DT, dj: float = _DJ,
                    s0: float = _S0, n_scales: int = _J + 1) -> jnp.ndarray:
    """CWT of [..., T] -> [..., T, n_scales] (real part, DOG m=2 mother).

    Torrence & Compo: W_n(s) = ifft( fft(x) * conj(psi_hat(s*w)) ) with
    psi_hat normalized to unit energy: sqrt(2*pi*s/dt) * psi0_hat(s*w),
    psi0_hat(w) = -(i^m)/sqrt(gamma(m+1/2)) * w^m * exp(-w^2/2).
    For m=2, -(i^2) = +1 so psi0_hat is real and positive.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    scales = jnp.asarray(cwt_scales(dt, dj, s0, n_scales))  # [S]

    # angular frequencies of the rfft bins
    k = jnp.arange(n // 2 + 1)
    omega = 2.0 * jnp.pi * k / (n * dt)  # [F] (>= 0)

    xh = jnp.fft.rfft(x, axis=-1)  # [..., F]
    sw = scales[:, None] * omega[None, :]  # [S, F]
    norm = jnp.sqrt(2.0 * jnp.pi * scales / dt)  # [S]
    psi_hat = (sw ** _M) * jnp.exp(-0.5 * sw ** 2) / np.sqrt(_gamma(_M + 0.5))
    psi_hat = norm[:, None] * psi_hat  # [S, F]

    w = jnp.fft.irfft(xh[..., None, :] * psi_hat, n=n, axis=-1)  # [..., S, T]
    return jnp.swapaxes(w, -1, -2)  # [..., T, S]


def inverse_cwt(wavelet_lf0: jnp.ndarray, n_scales: int = _J + 1) -> jnp.ndarray:
    """Heuristic reconstruction used by the reference (``utils/cwt.py:118-133``):
    scale-weighted sum then per-sequence standardization.  [..., T, S] -> [..., T]."""
    b = (jnp.arange(n_scales, dtype=jnp.float32) + 1.0 + 2.5) ** (-2.5)
    rec = (wavelet_lf0 * b).sum(-1)
    mean = rec.mean(-1, keepdims=True)
    std = rec.std(-1, keepdims=True)
    return (rec - mean) / jnp.maximum(std, 1e-8)


def cwt2f0(cwt_spec: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray,
           n_scales: int = _J + 1) -> jnp.ndarray:
    """[B, T, S] CWT spectrogram + per-utterance (mean, std) -> f0 Hz [B, T]."""
    lf0 = inverse_cwt(cwt_spec, n_scales)
    lf0 = lf0 * std[:, None] + mean[:, None]
    return jnp.exp(lf0)
