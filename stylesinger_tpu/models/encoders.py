"""GE2E-style utterance encoders: emotion + speaker d-vectors.

Behavioral parity targets (AaronZ345/StyleSinger):
- ``EmotionEncoder`` (``data_gen/tts/emotion/model.py:11-77``): 3-layer
  LSTM(40 -> 256); training ``forward`` applies linear + ReLU + L2-norm,
  but **inference** (``model.py:63-77``) returns the raw last hidden state
  — no projection. ``embed_utterance`` (``inference.py:112-155``) averages
  the raw partial embeddings and L2-normalizes once.
- Speaker encoder: the external resemblyzer ``VoiceEncoder``
  (``data_gen/style_binarizer.py:19,318``) has the identical architecture
  but its inference path IS the projected one: each partial goes through
  linear + ReLU + per-partial L2-norm before the mean + final norm.
- Front-end (``data_gen/tts/emotion/audio.py:43-57``): **power** mel (not
  log) — librosa 0.8 ``melspectrogram`` semantics: centered reflect-pad
  STFT (25 ms window / 10 ms hop @16 kHz), |.|^2, 40-bin Slaney mel.
- Partial slicing (``inference.py:59-110``): sample-domain sliding slices
  of 160 frames with 50 % overlap; the trailing slice is dropped when its
  wav coverage is < 0.75 (``min_pad_coverage``), and the wav is padded out
  to the last slice's end.
- Preprocessing for the emotion path (``audio.py:13-40``): resample to
  16 kHz, volume-normalize to -30 dBFS (increase only), VAD silence trim.
  The reference's *speaker* path skips all of this and feeds the native-
  rate wav straight in (``style_binarizer.py:325``,
  ``inference/StyleSinger.py:100-104``) — a reference quirk kept behind
  ``spk_embed_at_native_rate`` for checkpoint parity.

TPU-native design: partials form a static [P, 160, 40] batch -> one
batched LSTM scan; P is bucketed to powers of two so XLA compiles a
handful of shapes, not one per utterance length. The GE2E training
objective is a pure function for fine-tuning.
"""

from __future__ import annotations

from math import gcd
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.mel import _hann_periodic, mel_filterbank

# GE2E front-end constants (params_data.py)
GE2E_SR = 16000
GE2E_N_FFT = 400          # 25 ms at 16 kHz
GE2E_HOP = 160            # 10 ms
GE2E_N_MELS = 40
PARTIAL_FRAMES = 160
INFERENCE_FRAMES = 80
AUDIO_NORM_TARGET_DBFS = -30.0


# ---------------------------------------------------------------------------
# resampling + preprocessing (host-side numpy)
# ---------------------------------------------------------------------------

def resample_wav(wav: np.ndarray, orig_sr: int, target_sr: int
                 ) -> np.ndarray:
    """Polyphase windowed-sinc resampler (Kaiser β=5, 20·max_rate+1 taps —
    the ``scipy.signal.resample_poly`` default design), replacing the
    round-1 ``np.interp`` (which aliased >8 kHz energy into the d-vector
    mels). Output length = ceil(len·up/down), zero-phase."""
    g = gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    if up == down:
        return np.asarray(wav, np.float32)
    max_rate = max(up, down)
    half = 10 * max_rate
    n = np.arange(-half, half + 1)
    cutoff = 1.0 / max_rate                      # Nyquist-normalized
    h = np.sinc(cutoff * n) * np.kaiser(2 * half + 1, 5.0)
    h *= up / h.sum()                            # unit DC gain (firwin)
    x_up = np.zeros(len(wav) * up, np.float64)
    x_up[::up] = np.asarray(wav, np.float64)
    y = np.convolve(x_up, h)[half: half + len(x_up)]
    n_out = -(-len(wav) * up // down)            # ceil
    out = np.zeros(n_out, np.float64)
    dec = y[::down]
    out[: len(dec)] = dec
    return out.astype(np.float32)


def normalize_volume(wav: np.ndarray, target_dbfs: float,
                     increase_only: bool = False,
                     decrease_only: bool = False) -> np.ndarray:
    """RMS dBFS normalization (reference audio.py:103-109)."""
    rms = np.sqrt(np.mean(np.square(wav)) + 1e-12)
    change = target_dbfs - 20.0 * np.log10(max(rms, 1e-12))
    if (change < 0 and increase_only) or (change > 0 and decrease_only):
        return wav
    return (wav * (10.0 ** (change / 20.0))).astype(np.float32)


def preprocess_wav(wav: np.ndarray, source_sr: int = GE2E_SR
                   ) -> np.ndarray:
    """Emotion-path preprocessing (reference ``audio.py::preprocess_wav``):
    resample -> 16 kHz, volume-normalize to -30 dBFS (increase only), trim
    long silences (energy-VAD analogue of webrtcvad)."""
    from stylesinger_tpu.dsp.vad import trim_long_silences

    wav = np.asarray(wav, np.float32)
    if source_sr != GE2E_SR:
        wav = resample_wav(wav, source_sr, GE2E_SR)
    wav = normalize_volume(wav, AUDIO_NORM_TARGET_DBFS, increase_only=True)
    wav, _ = trim_long_silences(wav, GE2E_SR)
    return wav


# ---------------------------------------------------------------------------
# mel front-end
# ---------------------------------------------------------------------------

def ge2e_mel_np(wav: np.ndarray) -> np.ndarray:
    """wav (interpreted at 16 kHz) -> [T, 40] **power** mel — librosa 0.8
    ``melspectrogram`` semantics as used by resemblyzer and the emotion
    encoder (reference audio.py:43-57: "this is not a log-mel"): centered
    reflect-pad STFT, hann(400)/hop 160, |.|^2 @ Slaney mel."""
    wav = np.asarray(wav, np.float32)
    pad = GE2E_N_FFT // 2
    if len(wav) < pad + 1:      # too short to reflect: zero-extend first
        wav = np.pad(wav, (0, pad + 1 - len(wav)))
    wav = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(wav) - GE2E_N_FFT) // GE2E_HOP
    idx = (np.arange(n_frames)[:, None] * GE2E_HOP +
           np.arange(GE2E_N_FFT)[None, :])
    frames = wav[idx] * _hann_periodic(GE2E_N_FFT)
    mag = np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)
    basis = mel_filterbank(GE2E_SR, GE2E_N_FFT, GE2E_N_MELS, 0.0,
                           GE2E_SR / 2)
    return ((mag ** 2) @ basis.T).astype(np.float32)


def compute_partial_slices(n_samples: int,
                           partial_frames: int = PARTIAL_FRAMES,
                           min_pad_coverage: float = 0.75,
                           overlap: float = 0.5
                           ) -> Tuple[List[slice], List[slice]]:
    """(wav_slices, mel_slices) of sliding 160-frame partials — the
    reference's sample-domain slicing (inference.py:59-110): mel frame i
    starts at sample i·160; the last partial is dropped when < 75 % of it
    is real audio (and more than one partial exists)."""
    spf = GE2E_HOP                                  # samples per frame
    n_frames = int(np.ceil((n_samples + 1) / spf))
    step = max(int(np.round(partial_frames * (1 - overlap))), 1)
    wav_slices, mel_slices = [], []
    for i in range(0, max(1, n_frames - partial_frames + step + 1), step):
        mel_slices.append(slice(i, i + partial_frames))
        wav_slices.append(slice(i * spf, (i + partial_frames) * spf))
    last = wav_slices[-1]
    coverage = (n_samples - last.start) / (last.stop - last.start)
    if coverage < min_pad_coverage and len(mel_slices) > 1:
        wav_slices, mel_slices = wav_slices[:-1], mel_slices[:-1]
    return wav_slices, mel_slices


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class UtteranceEncoder(nn.Module):
    """3-layer LSTM + (optional) projection head (GE2E).

    ``project=True`` is the resemblyzer/speaker inference path and the
    GE2E training forward (linear + ReLU + per-sample L2-norm);
    ``project=False`` is the emotion inference path (raw last hidden
    state, reference model.py:63-77)."""
    hidden_size: int = 256
    embed_size: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, mels: jnp.ndarray, project: bool = True
                 ) -> jnp.ndarray:
        """mels: [B, T, 40] -> [B, embed_size]."""
        x = mels
        for i in range(self.num_layers):
            # the cell binds to THIS module's scope, so name the cell (the
            # RNN wrapper holds no params of its own)
            cell = nn.OptimizedLSTMCell(self.hidden_size,
                                        name=f"lstm_{i}")
            x = nn.RNN(cell)(x)
        last_hidden = x[:, -1, :]
        # ALWAYS call the projection so its params exist no matter which
        # path an init took (declaring an unused nn.Dense creates nothing
        # in flax; an emotion-path init would otherwise lack 'proj' and
        # break a later project=True apply)
        e = jax.nn.relu(nn.Dense(self.embed_size, name="proj")(last_hidden))
        if not project:
            return last_hidden
        return e / jnp.maximum(
            jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)

    # -------------------------------------------------------- inference
    def embed_utterance(self, variables, wav: np.ndarray,
                        project: bool = True) -> np.ndarray:
        """Full utterance wav (16 kHz semantics) -> one unit-norm
        embedding: partial slices -> batched LSTM -> mean -> L2-norm
        (reference inference.py:112-155 / resemblyzer embed_utterance)."""
        wav = np.asarray(wav, np.float32)
        wav_slices, mel_slices = compute_partial_slices(len(wav))
        max_len = wav_slices[-1].stop
        if max_len >= len(wav):
            wav = np.pad(wav, (0, max_len - len(wav)))
        frames = ge2e_mel_np(wav)
        partials = np.stack([frames[s] for s in mel_slices])
        embeds = self._apply_bucketed(variables, partials, project)
        raw = embeds.mean(axis=0)
        return (raw / max(np.linalg.norm(raw), 1e-8)).astype(np.float32)

    def _apply_bucketed(self, variables, partials: np.ndarray,
                        project: bool) -> np.ndarray:
        """Pad the partial batch to a power of two so XLA sees a handful
        of shapes across utterance lengths (each distinct shape is a full
        compile — expensive on remote-compile backends)."""
        p = partials.shape[0]
        bucket = 1 << (p - 1).bit_length()
        if bucket != p:
            partials = np.pad(partials,
                              ((0, bucket - p), (0, 0), (0, 0)))
        out = self.apply(variables, jnp.asarray(partials), project=project)
        return np.asarray(out)[:p]


def ge2e_loss(embeds: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
              ) -> jnp.ndarray:
    """GE2E softmax contrast loss. embeds: [S, U, E] unit-norm.

    Centroid similarity matrix with leave-one-out diagonal (the training
    objective of the reference encoder; model.py:41-60 + GE2E paper)."""
    s, u, e = embeds.shape
    centroids = embeds.mean(axis=1)                              # [S, E]
    centroids_excl = (embeds.sum(axis=1, keepdims=True) - embeds) / (u - 1)
    cent_norm = centroids / jnp.maximum(
        jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-8)
    excl_norm = centroids_excl / jnp.maximum(
        jnp.linalg.norm(centroids_excl, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("sue,ke->suk", embeds, cent_norm)
    own = jnp.einsum("sue,sue->su", embeds, excl_norm)
    idx = jnp.arange(s)
    sim = sim.at[idx, :, idx].set(own)
    sim = w * sim + b
    labels = jnp.broadcast_to(idx[:, None], (s, u))
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1).mean()
