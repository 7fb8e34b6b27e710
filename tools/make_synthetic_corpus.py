"""Synthetic singing corpus generator (no external data needed).

Produces a GTSinger-shaped corpus (``metadata.json`` + wavs) for
training-quality validation of the full pipeline: each utterance is a
formant-filtered harmonic "voice" singing a random MIDI note sequence with
vibrato, portamento and per-note vowels, so the mapping
(phoneme, note) -> (mel, F0) is learnable and the ground truth is known
exactly.

The metadata matches what the binarizer expects
(``stylesinger_tpu/data/binarize.py``; reference contract
``data_gen/style_binarizer.py:262-272``): item_name, ph, ph_durs, wav_fn,
singer, ep_pitches, ep_notedurs, ep_types.

Singers differ by formant scaling and spectral tilt, so speaker identity is
a real, learnable factor; one singer is held out entirely for the zero-shot
test split.

Usage: python tools/make_synthetic_corpus.py <out_dir> [n_utts] [seed]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SR = 24000

# vowel -> two formant centers (Hz); classic average values
VOWELS = {
    "a": (800.0, 1200.0),
    "e": (500.0, 1900.0),
    "i": (300.0, 2300.0),
    "o": (500.0, 900.0),
    "u": (350.0, 700.0),
}

# singer -> (formant scale, spectral tilt exponent, vibrato depth semitones)
SINGERS = {
    "s1": (0.92, 1.0, 0.25),
    "s2": (1.00, 1.4, 0.35),
    "s3": (1.10, 0.7, 0.45),
}


def midi_to_hz(m):
    return 440.0 * 2.0 ** ((np.asarray(m, np.float64) - 69.0) / 12.0)


def _resonance_gain(freqs: np.ndarray, center: float,
                    bw: float = 130.0) -> np.ndarray:
    """Lorentzian-ish formant resonance gain at ``freqs``."""
    return 1.0 / (1.0 + ((freqs - center) / bw) ** 2)


def synth_utterance(notes, durs, vowels, singer, rng, sr=SR):
    """Render one utterance; returns (wav float32, f0_track fn of time)."""
    fscale, tilt, vib_semi = SINGERS[singer]
    total = float(np.sum(durs))
    n = int(round(total * sr))
    t = np.arange(n) / sr

    # piecewise-constant target F0 with 30 ms portamento between notes,
    # 5.5 Hz vibrato (scaled per singer), zero on rests
    bounds = np.cumsum([0.0] + list(durs))
    f0 = np.zeros(n)
    voiced = np.zeros(n, bool)
    for i, (note, d) in enumerate(zip(notes, durs)):
        s, e = int(bounds[i] * sr), min(int(bounds[i + 1] * sr), n)
        if note == 0:
            continue
        f0[s:e] = midi_to_hz(note)
        voiced[s:e] = True
    # portamento: moving-average the log-f0 over voiced runs
    win = max(1, int(0.03 * sr))
    lf = np.where(voiced, np.log(np.maximum(f0, 1.0)), 0.0)
    kern = np.ones(win) / win
    sm = np.convolve(lf, kern, "same")
    cnt = np.convolve(voiced.astype(np.float64), kern, "same")
    lf = np.where(cnt > 1e-6, sm / np.maximum(cnt, 1e-6), 0.0)
    f0 = np.where(voiced, np.exp(lf), 0.0)
    vib = 2.0 ** (vib_semi / 12.0 * np.sin(2 * np.pi * 5.5 * t))
    f0 = f0 * np.where(voiced, vib, 1.0)

    # continuous phase for each harmonic; formant-shaped amplitudes that
    # switch with the per-note vowel
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = np.zeros(n)
    n_harm = 16
    for i, (note, d, vw) in enumerate(zip(notes, durs, vowels)):
        s, e = int(bounds[i] * sr), min(int(bounds[i + 1] * sr), n)
        if note == 0 or e <= s:
            continue
        fr = midi_to_hz(note)
        f1, f2 = (c * fscale for c in VOWELS[vw])
        seg = np.zeros(e - s)
        for h in range(1, n_harm + 1):
            hf = fr * h
            if hf > sr / 2 - 500:
                break
            amp = (0.6 * _resonance_gain(hf, f1) +
                   0.4 * _resonance_gain(hf, f2) + 0.05) / h ** tilt
            seg += amp * np.sin(h * phase[s:e])
        # 15 ms raised-cosine edges against clicks
        env = np.ones(e - s)
        k = min(int(0.015 * sr), (e - s) // 2)
        if k > 0:
            ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(k) / k)
            env[:k] = ramp
            env[-k:] = ramp[::-1]
        wav[s:e] += seg * env

    peak = np.abs(wav).max()
    if peak > 0:
        wav = wav / peak * 0.5
    # a touch of breath noise keeps the binarizer's VAD/energy paths honest
    wav = wav + rng.standard_normal(n) * 1e-4
    return wav.astype(np.float32)


def make_corpus(out_dir: str, n_utts: int = 120, seed: int = 0) -> str:
    """Writes wavs + metadata.json under ``out_dir``; returns metadata path.

    Split convention: singer s3 only appears in items named ``test_*``
    (zero-shot: never trained on), matching the reference's prefix-based
    split (style_binarizer.py:252-260, where only test prefixes are
    excluded from train).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    from stylesinger_tpu.dsp.mel import save_wav

    vowel_names = list(VOWELS)
    meta = []
    for i in range(n_utts):
        held_out = i % 10 == 0
        singer = "s3" if held_out else ("s1" if i % 2 else "s2")
        n_notes = int(rng.integers(6, 11))
        # random walk over a scale, occasional rests
        base = int(rng.integers(57, 70))
        notes, durs, vws = [], [], []
        cur = base
        for j in range(n_notes):
            if rng.random() < 0.12 and 0 < j < n_notes - 1:
                notes.append(0)
                vws.append("SP")
            else:
                cur = int(np.clip(cur + rng.integers(-4, 5), 52, 79))
                notes.append(cur)
                vws.append(vowel_names[int(rng.integers(len(vowel_names)))])
            durs.append(float(rng.uniform(0.2, 0.5)))
        wav = synth_utterance(notes, durs, vws, singer, rng)
        # ALL held-out (s3) items are test_-prefixed: the reference split
        # only excludes test_ prefixes from train (style_binarizer.py:256),
        # so a valid_-only prefix would leak the zero-shot singer into train
        prefix = "test_" if held_out else ""
        item = f"{prefix}{singer}#syn_{i:04d}"
        wav_fn = os.path.join(out_dir, f"syn_{i:04d}.wav")
        save_wav(wav, wav_fn, SR)
        meta.append({
            "item_name": item,
            "ph": vws,
            "ph_durs": durs,
            "wav_fn": wav_fn,
            "singer": singer,
            "ep_pitches": notes,
            "ep_notedurs": durs,
            "ep_types": [2 if p == "SP" else 1 for p in vws],
        })
    meta_fn = os.path.join(out_dir, "metadata.json")
    json.dump(meta, open(meta_fn, "w"))
    return meta_fn


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "data/raw/synthetic"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    fn = make_corpus(out, n, seed)
    print(f"wrote {n} utterances -> {fn}")
