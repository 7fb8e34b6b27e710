"""Raw-corpus preprocessor: text normalization + g2p -> metadata.json.

Parity target: ``BasePreprocessor``
(``data_gen/tts/base_preprocess.py:34-152`` in AaronZ345/StyleSinger): walk
raw items (txt, wav_fn, singer, optional MIDI streams), run the language's
text processor, build the phone set, and write
``<processed_data_dir>/metadata.json`` + ``phone_set.json`` for the
binarizer.  Wav processors are a registry of callables
(``data_gen/tts/wav_processors``), here simple numpy hooks.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from stylesinger_tpu.text_processors import get_txt_processor_cls

REGISTERED_WAV_PROCESSORS: Dict[str, Callable] = {}


def register_wav_processor(name: str):
    def wrap(fn):
        REGISTERED_WAV_PROCESSORS[name] = fn
        return fn
    return wrap


@register_wav_processor("trim_sil")
def _trim_sil(wav: np.ndarray, sr: int) -> np.ndarray:
    from stylesinger_tpu.dsp.vad import trim_long_silences
    return trim_long_silences(wav, sr)[0]


@register_wav_processor("norm_volume")
def _norm_volume(wav: np.ndarray, sr: int, target_dbfs: float = -30.0
                 ) -> np.ndarray:
    rms = np.sqrt((wav ** 2).mean() + 1e-12)
    gain = 10 ** (target_dbfs / 20) / max(rms, 1e-8)
    return np.clip(wav * gain, -1.0, 1.0)


@register_wav_processor("denoise")
def _denoise(wav: np.ndarray, sr: int, strength: float = 0.01) -> np.ndarray:
    """Spectral noise-floor suppression for raw recordings (stands in for
    the reference's external rnnoise/sox denoise hook,
    data_gen/tts/wav_processors/common_processors.py)."""
    from stylesinger_tpu.dsp.denoise import denoise as _spectral_denoise
    import jax.numpy as jnp
    n = len(wav)
    padded = np.pad(np.asarray(wav, np.float32), (0, 1024))
    out = _spectral_denoise(jnp.asarray(padded), strength)
    return np.asarray(out[:n], np.float32)


class Preprocessor:
    def __init__(self, cfg: Any, language: str = "zh"):
        self.cfg = cfg
        self.txt_processor = get_txt_processor_cls(language)

    def process_item(self, item: Dict) -> Optional[Dict]:
        """One raw item -> processed metadata row (ph list from g2p unless
        already provided, as in GTSinger-style corpora)."""
        out = dict(item)
        if "ph" not in out or not out["ph"]:
            phs, norm_txt = self.txt_processor.process(out["txt"])
            out["ph"] = phs
            out["txt"] = norm_txt
        elif isinstance(out["ph"], str):
            out["ph"] = out["ph"].split(" ")
        return out

    def process(self, items: List[Dict],
                out_dir: Optional[str] = None) -> List[Dict]:
        out_dir = out_dir or self.cfg["processed_data_dir"]
        os.makedirs(out_dir, exist_ok=True)
        rows = []
        for item in items:
            row = self.process_item(item)
            if row is not None:
                rows.append(row)
        phones = sorted({p for r in rows for p in r["ph"]})
        json.dump(phones, open(os.path.join(out_dir, "phone_set.json"),
                               "w"), ensure_ascii=False)
        json.dump(rows, open(os.path.join(out_dir, "metadata.json"), "w"),
                  ensure_ascii=False)
        print(f"| preprocess: {len(rows)} items, {len(phones)} phones")
        return rows

    def build_mfa_inputs(self, rows: List[Dict],
                         out_dir: Optional[str] = None) -> str:
        """Lay out a Montreal-Forced-Aligner corpus from processed rows
        (reference ``BasePreprocessor.build_mfa_inputs``,
        data_gen/tts/base_preprocess.py + ``train_mfa_align.py``):
        ``mfa_inputs/<group>/<item>.{wav,lab}`` with space-joined phones as
        the transcript, plus ``mfa_dict.txt`` mapping each phone to itself.
        MFA's TextGrid output then feeds ``dsp/textgrid_align.py``."""
        import shutil

        out_dir = out_dir or self.cfg["processed_data_dir"]
        mfa_dir = os.path.join(out_dir, "mfa_inputs")
        os.makedirs(mfa_dir, exist_ok=True)
        phones = set()
        for row in rows:
            group = str(row.get("singer", row.get("spk_name", "spk0")))
            gdir = os.path.join(mfa_dir, group)
            os.makedirs(gdir, exist_ok=True)
            name = row["item_name"]
            ph = row["ph"] if isinstance(row["ph"], list) else \
                row["ph"].split(" ")
            phones.update(ph)
            with open(os.path.join(gdir, f"{name}.lab"), "w") as f:
                f.write(" ".join(ph))
            if row.get("wav_fn") and os.path.exists(row["wav_fn"]):
                dst = os.path.join(gdir, f"{name}.wav")
                if os.path.abspath(row["wav_fn"]) != os.path.abspath(dst):
                    shutil.copyfile(row["wav_fn"], dst)
        with open(os.path.join(out_dir, "mfa_dict.txt"), "w") as f:
            for p in sorted(phones):
                f.write(f"{p} {p}\n")
        return mfa_dir
