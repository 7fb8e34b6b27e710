"""GE2E-style utterance encoders: emotion + speaker d-vectors.

Behavioral parity targets (AaronZ345/StyleSinger):
- ``EmotionEncoder`` (``data_gen/tts/emotion/model.py:11-77``): 3-layer
  LSTM(40 -> 256) over 40-bin log-mel partials -> linear + ReLU + L2-norm;
  ``embed_utterance``/``compute_partial_slices``
  (``data_gen/tts/emotion/inference.py:59-177``): slide 160-frame partials
  with 50% overlap, mean the partial embeddings, renormalize.
- Speaker encoder: the external resemblyzer ``VoiceEncoder`` has the
  identical GE2E architecture (``data_gen/style_binarizer.py:19,318``);
  this module serves both roles with separate parameter sets.
- 16 kHz / 40-mel / 25 ms window / 10 ms hop front-end
  (``data_gen/tts/emotion/params_data.py:1-10``).

TPU-native design: partials are a static [P, 160, 40] batch -> one batched
LSTM scan; the GE2E training objective (softmax contrast over speakers x
utterances, scaled cosine similarity) is a pure function for fine-tuning.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.mel import mel_filterbank, stft_magnitude

# GE2E front-end constants (params_data.py)
GE2E_SR = 16000
GE2E_N_FFT = 400          # 25 ms at 16 kHz
GE2E_HOP = 160            # 10 ms
GE2E_N_MELS = 40
PARTIAL_FRAMES = 160
INFERENCE_FRAMES = 80


def ge2e_mel_np(wav: np.ndarray) -> np.ndarray:
    """16 kHz wav -> [T, 40] log mel for the encoders (librosa-compatible
    power mel as used by resemblyzer/GE2E)."""
    mag = np.asarray(stft_magnitude(jnp.asarray(wav), GE2E_N_FFT, GE2E_HOP,
                                    GE2E_N_FFT))
    basis = mel_filterbank(GE2E_SR, GE2E_N_FFT, GE2E_N_MELS, 0.0,
                           GE2E_SR / 2)
    mel = (mag ** 2) @ basis.T
    return np.log10(np.maximum(mel, 1e-10)).astype(np.float32)


def compute_partial_slices(n_frames: int,
                           partial_frames: int = PARTIAL_FRAMES,
                           overlap: float = 0.5):
    """Frame ranges of sliding partials covering the utterance
    (reference inference.py:59-110, min_pad_coverage handling folded in by
    clamping the last slice to the end)."""
    step = max(int(round(partial_frames * (1 - overlap))), 1)
    starts = list(range(0, max(n_frames - partial_frames, 0) + 1, step))
    if not starts:
        starts = [0]
    last = starts[-1]
    if n_frames - last > partial_frames * 0.75 and \
            last + partial_frames < n_frames:
        starts.append(n_frames - partial_frames)
    return [(s, s + partial_frames) for s in starts]


class UtteranceEncoder(nn.Module):
    """3-layer LSTM + projection, L2-normalized (GE2E)."""
    hidden_size: int = 256
    embed_size: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, mels: jnp.ndarray) -> jnp.ndarray:
        """mels: [B, T, 40] -> [B, embed_size] (unit-norm)."""
        x = mels
        carries = []
        for i in range(self.num_layers):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"lstm_{i}")
            x = rnn(x)
            carries.append(x)
        last_hidden = x[:, -1, :]
        e = jax.nn.relu(nn.Dense(self.embed_size, name="proj")(last_hidden))
        return e / jnp.maximum(
            jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)

    def embed_utterance(self, variables, mel: np.ndarray) -> np.ndarray:
        """Full utterance -> one embedding via mean of partial embeddings
        (reference inference.py:112-177)."""
        n = mel.shape[0]
        if n < PARTIAL_FRAMES:
            mel = np.pad(mel, ((0, PARTIAL_FRAMES - n), (0, 0)))
            n = PARTIAL_FRAMES
        slices = compute_partial_slices(n)
        partials = np.stack([mel[s:e] for s, e in slices])
        embeds = np.asarray(self.apply(variables, jnp.asarray(partials)))
        mean = embeds.mean(axis=0)
        return mean / max(np.linalg.norm(mean), 1e-8)


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
