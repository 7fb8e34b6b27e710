"""Generate the vendored Praat-oracle F0 goldens (tests/goldens/*.npy).

The oracle (tools/praat_oracle.py) is exact but slow (~8 s per audio
second on one core), so CI compares the fast tracker against these
pre-computed arrays instead of re-running it. Regenerate after any
oracle change:  python tools/gen_f0_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.praat_oracle import to_mel_frames, to_pitch_ac  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def synth_song(sr: int) -> np.ndarray:
    """Deterministic singing-like clip: vibrato glide + silence + steady
    note + breath noise (same formula as the test)."""
    t = np.arange(int(sr * 4.0)) / sr
    f0 = np.where(t < 1.5, 220.0 * 2 ** (t / 3.0) *
                  (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t)),
                  np.where(t < 2.0, 0.0, 330.0 *
                           (1 + 0.02 * np.sin(2 * np.pi * 6.0 * t))))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = 0.4 * np.sin(phase) + 0.12 * np.sin(2 * phase) + \
        0.06 * np.sin(3 * phase)
    wav *= (f0 > 0)
    rng = np.random.default_rng(7)
    wav = wav + 0.003 * rng.standard_normal(len(wav))
    return wav.astype(np.float32)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    from stylesinger_tpu.dsp.mel import load_wav

    ref_root = os.environ.get("STYLESINGER_REF_ROOT", "/root/reference")
    wav = load_wav(os.path.join(ref_root, "test", "test.wav"),
                   48000)[: 48000 * 6]
    gold, t1 = to_pitch_ac(wav, 48000, 256 / 48000)
    gold_mel = to_mel_frames(gold, len(wav) // 256, 256)
    np.save(os.path.join(OUT, "f0_testwav_48k_hop256.npy"),
            gold_mel.astype(np.float32))
    print(f"test.wav golden: {len(gold_mel)} frames, t1*sr/hop="
          f"{t1 * 48000 / 256:.3f}")

    wav2 = synth_song(24000)
    gold2, _ = to_pitch_ac(wav2, 24000, 128 / 24000)
    gold2_mel = to_mel_frames(gold2, len(wav2) // 128, 128)
    np.save(os.path.join(OUT, "f0_synth_24k_hop128.npy"),
            gold2_mel.astype(np.float32))
    print(f"synth golden: {len(gold2_mel)} frames")


if __name__ == "__main__":
    main()
