"""Objective evaluation of a generation directory.

Parity target: the reference's test_end post-processing
(``tasks/StyleSinger/stylesinger.py:156-306``: after synthesis it stores
wavs + result_f0s and leaves metric computation to the paper scripts).
Here the loop is closed: given ``<gen_dir>/wavs`` with ``X.wav`` /
``X_gt.wav`` pairs (as written by training.test_runner.TestRunner with
``save_gt``), compute MCD (mel domain) and FFE (F0 domain) per pair.

CLI: python -m stylesinger_tpu.eval.evaluate_gen <gen_dir> [--sr 48000]
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

from stylesinger_tpu.dsp.mel import load_wav, wav2spec_np
from stylesinger_tpu.dsp.pitch import extract_pitch
from stylesinger_tpu.eval.metrics import ffe, mcd, speaker_cosine


def evaluate_pair(wav_fn: str, gt_fn: str, sr: int,
                  cfg: Optional[Any] = None) -> Dict[str, float]:
    kw = {}
    if cfg is not None:
        kw = dict(sample_rate=cfg["audio_sample_rate"],
                  n_fft=cfg["fft_size"], hop_size=cfg["hop_size"],
                  win_length=cfg["win_size"],
                  n_mels=cfg["audio_num_mel_bins"], fmin=cfg["fmin"],
                  fmax=cfg["fmax"])
    hop = kw.get("hop_size", 256)
    a = load_wav(wav_fn, sr)
    b = load_wav(gt_fn, sr)
    mel_a = wav2spec_np(a, **kw)["mel"]
    mel_b = wav2spec_np(b, **kw)["mel"]
    f0_a = extract_pitch(a, hop_size=hop, sample_rate=sr)
    f0_b = extract_pitch(b, hop_size=hop, sample_rate=sr)
    return {"mcd": mcd(mel_b, mel_a), "ffe": ffe(f0_b, f0_a)}


def evaluate_dir(gen_dir: str, sr: int = 48000,
                 cfg: Optional[Any] = None,
                 spk_encoder_path: Optional[str] = None
                 ) -> Dict[str, float]:
    """Per-pair MCD + FFE; when ``spk_encoder_path`` (a GE2E/resemblyzer
    torch checkpoint, see ``convert.load_ge2e_checkpoint``) is given, also
    the paper's objective Cosine: d-vector similarity of each synthesized
    wav to its ground-truth reference."""
    spk_vars = spk_enc = None
    if spk_encoder_path:
        from stylesinger_tpu.convert import load_ge2e_checkpoint
        from stylesinger_tpu.models.encoders import UtteranceEncoder
        spk_enc = UtteranceEncoder()
        spk_vars = load_ge2e_checkpoint(spk_encoder_path)
    wav_dir = os.path.join(gen_dir, "wavs")
    rows: List[Dict] = []
    for fn in sorted(os.listdir(wav_dir)):
        if fn.endswith("_gt.wav"):
            continue
        if not fn.endswith(".wav"):
            continue
        gt = os.path.join(wav_dir, fn.replace(".wav", "_gt.wav"))
        if not os.path.exists(gt):
            continue
        m = evaluate_pair(os.path.join(wav_dir, fn), gt, sr, cfg)
        if spk_vars is not None:
            m["spk_cos"] = speaker_cosine(
                load_wav(os.path.join(wav_dir, fn), sr), load_wav(gt, sr),
                sr, spk_vars, spk_enc)
        m["item"] = fn
        rows.append(m)
    if not rows:
        return {"n": 0}
    out = {
        "n": len(rows),
        "mcd_mean": float(np.nanmean([r["mcd"] for r in rows])),
        "ffe_mean": float(np.nanmean([r["ffe"] for r in rows])),
    }
    if spk_vars is not None:
        out["spk_cos_mean"] = float(
            np.nanmean([r["spk_cos"] for r in rows]))
    with open(os.path.join(gen_dir, "metrics.json"), "w") as f:
        json.dump({"summary": out, "items": rows}, f, indent=2)
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("gen_dir")
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--spk_encoder", default=None,
                    help="GE2E/resemblyzer torch checkpoint; adds the "
                    "paper's objective Cosine (d-vector similarity)")
    a = ap.parse_args()
    print(json.dumps(evaluate_dir(a.gen_dir, a.sr,
                                  spk_encoder_path=a.spk_encoder)))
