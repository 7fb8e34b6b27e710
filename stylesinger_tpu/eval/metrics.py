"""Objective evaluation metrics.

Parity targets (AaronZ345/StyleSinger):
- speaker/emotion verification EER (``data_gen/tts/emotion/
  test_emotion.py:32-60`` via sklearn ROC) — here a self-contained numpy
  ROC/EER;
- the paper's objective metrics FFE (F0 frame error) and MCD
  (mel-cepstral distortion) used for the parity gate vs the PyTorch
  checkpoint (BASELINE.md targets).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def compute_eer(scores: np.ndarray, labels: np.ndarray
                ) -> Tuple[float, float]:
    """Equal error rate from similarity scores (1 = same class).
    Returns (eer, threshold)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels).astype(bool)
    order = np.argsort(-scores)
    s = scores[order]
    l = labels[order]
    tp = np.cumsum(l)
    fp = np.cumsum(~l)
    fn = l.sum() - tp
    tn = (~l).sum() - fp
    fpr = fp / np.maximum(fp + tn, 1)
    fnr = fn / np.maximum(fn + tp, 1)
    i = int(np.argmin(np.abs(fpr - fnr)))
    eer = float((fpr[i] + fnr[i]) / 2)
    return eer, float(s[i])


def ffe(f0_ref: np.ndarray, f0_pred: np.ndarray,
        tol: float = 0.2) -> float:
    """F0 frame error: fraction of frames with a voicing error or >20%
    pitch deviation."""
    n = min(len(f0_ref), len(f0_pred))
    a, b = np.asarray(f0_ref[:n]), np.asarray(f0_pred[:n])
    va, vb = a > 0, b > 0
    voicing_err = va != vb
    both = va & vb
    pitch_err = np.zeros(n, bool)
    pitch_err[both] = np.abs(b[both] - a[both]) > tol * a[both]
    return float((voicing_err | pitch_err).mean()) if n else float("nan")


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    """Cosine similarity of two embedding vectors (the paper's objective
    "Cosine" timbre-similarity metric, computed between d-vectors of the
    synthesized and the reference audio — the reference extracts those
    d-vectors with the resemblyzer VoiceEncoder,
    ``inference/StyleSinger.py:100-106`` / ``data_gen/style_binarizer.py``)."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = max(float(np.linalg.norm(a) * np.linalg.norm(b)), 1e-12)
    return float(np.dot(a, b) / denom)


def speaker_cosine(wav_a: np.ndarray, wav_b: np.ndarray, sr: int,
                   variables, encoder=None) -> float:
    """d-vector cosine between two waveforms: resample to the GE2E 16 kHz
    front-end, embed each with the (pretrained) speaker encoder, cosine.

    ``variables``: flax variables of ``models.encoders.UtteranceEncoder``
    (load real weights via ``convert.load_ge2e_checkpoint`` — random
    weights make the number meaningless)."""
    from stylesinger_tpu.models.encoders import (UtteranceEncoder,
                                                 preprocess_wav)

    enc = encoder or UtteranceEncoder()
    ea = enc.embed_utterance(variables, preprocess_wav(wav_a, sr))
    eb = enc.embed_utterance(variables, preprocess_wav(wav_b, sr))
    return cosine(ea, eb)


def mcd(mel_ref: np.ndarray, mel_pred: np.ndarray) -> float:
    """Mel-cepstral distortion (dB) over aligned log-mel frames (a common
    proxy computed directly on log10-mel features)."""
    n = min(len(mel_ref), len(mel_pred))
    diff = np.asarray(mel_ref[:n]) - np.asarray(mel_pred[:n])
    # log10 -> dB conversion constant, per MCD convention
    k = 10.0 / np.log(10.0) * np.sqrt(2.0)
    return float(k * np.sqrt((diff ** 2).sum(-1)).mean()) if n else \
        float("nan")
