"""F0 tools: quantization, normalization, and a TPU-native pitch tracker.

Parity targets in the reference:
- ``f0_to_coarse`` / ``norm_f0`` / ``denorm_f0`` / ``norm_interp_f0``
  (``utils/pitch_utils.py:22-78``) — re-implemented functionally (masking via
  ``where`` instead of in-place writes).
- Praat's autocorrelation pitch tracker used through parselmouth
  (``data_gen/style_binarizer.py:365-388``, ``to_pitch_ac`` with
  voicing_threshold 0.6, floor 80 Hz, ceiling 800 Hz) — replaced by
  ``autocorr_pitch``: a Boersma-1993-style batched autocorrelation tracker
  (windowed AC via FFT, window-AC correction, parabolic peak interpolation,
  Viterbi path over candidates) written entirely in JAX so the binarizer can
  run on-device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127.0 * np.log(1 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1 + F0_MAX / 700.0)


def f0_to_coarse(f0: jnp.ndarray) -> jnp.ndarray:
    """Quantize f0 (Hz) to 256 mel-spaced bins in [1, 255]; 0 Hz -> bin 1."""
    f0_mel = 1127.0 * jnp.log(1 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, F0_BIN - 1)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def norm_f0(f0: jnp.ndarray, uv: Optional[jnp.ndarray] = None, *,
            pitch_norm: str = "log", use_uv: bool = True,
            f0_mean: float = 400.0, f0_std: float = 100.0) -> jnp.ndarray:
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = jnp.log2(f0 + 1e-8)
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0(f0: jnp.ndarray, uv: Optional[jnp.ndarray] = None, *,
              pitch_norm: str = "log", use_uv: bool = True,
              f0_mean: float = 400.0, f0_std: float = 100.0,
              pitch_padding: Optional[jnp.ndarray] = None,
              f0_min: Optional[float] = None,
              f0_max: Optional[float] = None) -> jnp.ndarray:
    if pitch_norm == "standard":
        f0 = f0 * f0_std + f0_mean
    elif pitch_norm == "log":
        f0 = 2.0 ** f0
    if f0_min is not None:
        f0 = jnp.maximum(f0, f0_min)
    if f0_max is not None:
        f0 = jnp.minimum(f0, f0_max)
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = jnp.where(pitch_padding, 0.0, f0)
    return f0


def norm_interp_f0_np(f0: np.ndarray, *, pitch_norm: str = "log",
                      use_uv: bool = True, f0_mean: float = 400.0,
                      f0_std: float = 100.0) -> Tuple[np.ndarray, np.ndarray]:
    """Normalize f0 and linearly interpolate over unvoiced gaps (offline)."""
    f0 = np.asarray(f0, dtype=np.float32).copy()
    uv = (f0 == 0).astype(np.float32)
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = np.log2(f0 + 1e-8)
    if use_uv:
        f0[uv > 0] = 0
    n_uv = int(uv.sum())
    if n_uv == len(f0):
        f0[:] = 0
    elif n_uv > 0:
        f0[uv > 0] = np.interp(
            np.where(uv > 0)[0], np.where(uv == 0)[0], f0[uv == 0])
    return f0.astype(np.float32), uv


# ---------------------------------------------------------------------------
# Autocorrelation pitch tracker (Boersma 1993 style), batched JAX
# ---------------------------------------------------------------------------

_OCTAVE_COST = 0.01
_OCTAVE_JUMP_COST = 0.35
_VOICED_UNVOICED_COST = 0.14
_SILENCE_THRESHOLD = 0.03
_MAX_CANDIDATES = 15


def _hann(n: int) -> np.ndarray:
    i = np.arange(n)
    return (0.5 - 0.5 * np.cos(2 * np.pi * (i + 0.5) / n)).astype(np.float32)


def autocorr_pitch(wav: jnp.ndarray, *, hop_size: int = 256,
                   sample_rate: int = 48000, f0_min: float = 80.0,
                   f0_max: float = 800.0,
                   voicing_threshold: float = 0.6) -> jnp.ndarray:
    """Track F0 of a mono wav [T] -> f0 [T // hop_size] (Hz; 0 = unvoiced).

    Pipeline (all static shapes, one Viterbi ``lax.scan``):
      1. frame with a 3/f0_min-second window on hop_size centers,
      2. mean-subtract, Hann-window, autocorrelate via rFFT,
      3. normalize by the window's own autocorrelation (Boersma's trick),
      4. pick local maxima in the valid lag band, parabolic interpolation,
      5. top-K candidates + an unvoiced candidate, Viterbi with octave-jump
         and voicing-transition costs.

    Output frame count and centering mirror the reference's parselmouth
    padding (``utils/audios/pitch_extractors.py:30-41``).
    """
    wav = jnp.asarray(wav, dtype=jnp.float32)
    n_mel_frames = wav.shape[-1] // hop_size

    wlen = int(round(3.0 * sample_rate / f0_min))
    wlen += wlen % 2  # even
    nfft = int(2 ** np.ceil(np.log2(2 * wlen)))
    lag_min = max(2, int(np.floor(sample_rate / f0_max)))
    lag_max = int(np.ceil(sample_rate / f0_min))
    lag_max = min(lag_max, wlen - 2)

    # Praat computes frames whose whole window fits inside the signal; the
    # reference then zero-pads symmetrically back to n_mel frames. We center
    # windows on the same time grid and zero-pad the wav instead, which
    # yields the identical frame count directly.
    n_frames = n_mel_frames
    pad = wlen // 2
    padded = jnp.pad(wav, (pad, pad + hop_size))
    centers = jnp.arange(n_frames) * hop_size + hop_size // 2
    idx = centers[:, None] + jnp.arange(wlen)[None, :]
    frames = padded[idx]  # [N, W]

    # global/local peak for the silence criterion
    global_peak = jnp.maximum(jnp.max(jnp.abs(wav)), 1e-12)
    local_peak = jnp.max(jnp.abs(frames), axis=-1)  # [N]

    x = frames - jnp.mean(frames, axis=-1, keepdims=True)
    window = jnp.asarray(_hann(wlen))
    xw = x * window

    # autocorrelation of the windowed frames and of the window itself
    spec = jnp.fft.rfft(xw, n=nfft, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[:, : lag_max + 2]
    ac0 = jnp.maximum(ac[:, :1], 1e-12)
    r = ac / ac0  # [N, L+2]

    wspec = jnp.fft.rfft(window, n=nfft)
    wac = jnp.fft.irfft(wspec * jnp.conj(wspec), n=nfft)[: lag_max + 2]
    wac = wac / jnp.maximum(wac[0], 1e-12)
    r = r / jnp.maximum(wac[None, :], 1e-3)  # window-AC correction

    lags = jnp.arange(lag_max + 2)
    valid = (lags >= lag_min) & (lags <= lag_max)

    # local maxima with parabolic interpolation
    rm = r[:, 1:-1]
    is_peak = (rm > r[:, :-2]) & (rm >= r[:, 2:]) & valid[None, 1:-1]
    denom = r[:, :-2] - 2 * rm + r[:, 2:]
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (r[:, :-2] - r[:, 2:]) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    peak_val = rm - 0.25 * (r[:, :-2] - r[:, 2:]) * delta
    peak_lag = lags[1:-1].astype(jnp.float32) + delta

    # candidate strength with Praat's octave-cost correction
    # (R - OctaveCost * log2(min_pitch * tau_seconds))
    strength = jnp.where(is_peak, peak_val - _OCTAVE_COST *
                         jnp.log2(f0_min * peak_lag / sample_rate), -jnp.inf)

    top_val, top_idx = jax.lax.top_k(strength, _MAX_CANDIDATES)  # [N, K]
    top_lag = jnp.take_along_axis(peak_lag, top_idx, axis=-1)
    cand_f0 = sample_rate / jnp.maximum(top_lag, 1.0)
    cand_f0 = jnp.where(jnp.isfinite(top_val), cand_f0, 0.0)
    cand_ok = jnp.isfinite(top_val) & (cand_f0 >= f0_min) & (cand_f0 <= f0_max)
    voiced_strength = jnp.where(cand_ok, jnp.minimum(top_val, 1.0), -1e9)

    # unvoiced candidate strength (Boersma eq. silence/voicing tradeoff)
    unvoiced_strength = voicing_threshold + jnp.maximum(
        0.0, 2.0 - (local_peak / global_peak)
        / (_SILENCE_THRESHOLD / (1.0 + voicing_threshold)))

    all_strength = jnp.concatenate(
        [voiced_strength, unvoiced_strength[:, None]], axis=-1)  # [N, K+1]
    all_f0 = jnp.concatenate(
        [cand_f0, jnp.zeros_like(unvoiced_strength[:, None])], axis=-1)

    # Viterbi over frames
    k1 = _MAX_CANDIDATES + 1
    log_f0 = jnp.where(all_f0 > 0, jnp.log2(jnp.maximum(all_f0, 1e-6)), 0.0)
    is_voiced = all_f0 > 0

    # Praat normalizes transition costs to a 10 ms step: costs are
    # multiplied by 0.01/dt (Pitch_pathFinder's timeStepCorrection), so a
    # finer hop pays proportionally more per transition
    ts_corr = 0.01 * sample_rate / hop_size

    def trans_cost(f_prev, v_prev, f_cur, v_cur):
        both = v_prev & v_cur
        octave = _OCTAVE_JUMP_COST * ts_corr * jnp.abs(f_prev - f_cur)
        switch = jnp.where(v_prev ^ v_cur,
                           _VOICED_UNVOICED_COST * ts_corr, 0.0)
        return jnp.where(both, octave, switch)

    def step(carry, inp):
        score_prev, f_prev, v_prev = carry
        strength_t, f_t, v_t = inp
        # [K+1 prev, K+1 cur]
        cost = trans_cost(f_prev[:, None], v_prev[:, None],
                          f_t[None, :], v_t[None, :])
        total = score_prev[:, None] - cost + strength_t[None, :]
        best_prev = jnp.argmax(total, axis=0)
        score = jnp.max(total, axis=0)
        return (score, f_t, v_t), best_prev

    init = (all_strength[0], log_f0[0], is_voiced[0])
    (final_score, _, _), backptr = jax.lax.scan(
        step, init, (all_strength[1:], log_f0[1:], is_voiced[1:]))

    # backtrace
    last = jnp.argmax(final_score)

    def back_step(carry, bp):
        nxt = carry
        cur = bp[nxt]
        return cur, cur

    _, path_rev = jax.lax.scan(back_step, last, backptr, reverse=True)
    path = jnp.concatenate([path_rev, jnp.array([last])])  # [N]

    f0 = jnp.take_along_axis(all_f0, path[:, None], axis=-1)[:, 0]
    return f0


def extract_pitch(wav: np.ndarray, *, hop_size: int, sample_rate: int,
                  f0_min: float = 80.0, f0_max: float = 800.0,
                  voicing_threshold: float = 0.6) -> np.ndarray:
    """Offline entry point: numpy in, numpy out (runs the JAX tracker)."""
    f0 = autocorr_pitch(
        jnp.asarray(wav), hop_size=hop_size, sample_rate=sample_rate,
        f0_min=f0_min, f0_max=f0_max, voicing_threshold=voicing_threshold)
    return np.asarray(f0)
