"""Offline binarizer: metadata.json -> IndexedDataset shards.

Parity target: ``StyleSingingBinarizer``
(``data_gen/style_binarizer.py:248-405`` in AaronZ345/StyleSinger):
- loads ``<processed_data_dir>/metadata.json`` (items with ``item_name``,
  ``ph`` list, ``ph_durs`` seconds, ``wav_fn``, ``singer``, and the MIDI
  streams ``ep_pitches``/``ep_notedurs``/``ep_types``);
- splits train/valid/test by item-name prefixes (test names excluded from
  train; ``split_train_test_set``, :252-260);
- per item: wav -> log-mel (48 kHz STFT), F0 (cached ``<wav>.npy`` or the
  autocorrelation tracker), ``mel2ph`` from cumulative ``ph_durs``
  (:393-404), phone tokens from ``phone_set.json``;
- speaker + emotion d-vectors (GE2E encoders, replacing resemblyzer and the
  torch EmotionEncoder);
- writes ``{prefix}.data/.idx`` + ``{prefix}_lengths.npy`` +
  ``phone_set.json``.

TPU-native notes: the DSP runs through the JAX kernels in ``dsp/`` (jit
once, stream items); the worker pool is for wav decoding only.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from stylesinger_tpu.data.indexed_dataset import IndexedDatasetBuilder
from stylesinger_tpu.dsp.mel import load_wav, wav2spec_np
from stylesinger_tpu.dsp.pitch import extract_pitch
from stylesinger_tpu.text import TokenTextEncoder, build_token_encoder
from stylesinger_tpu.models.encoders import (
    UtteranceEncoder, preprocess_wav,
)


def mel2ph_from_ph_durs(ph_durs, n_frames: int, hop_size: int,
                        sample_rate: int) -> np.ndarray:
    """Cumulative-time rounding, matching the reference's
    ``process_align`` (style_binarizer.py:393-404)."""
    mel2ph = np.zeros([n_frames], np.int64)
    start = 0.0
    for i, d in enumerate(ph_durs):
        s = int(start * sample_rate / hop_size + 0.5)
        e = int((start + d) * sample_rate / hop_size + 0.5)
        mel2ph[s:e] = i + 1
        start += d
    return mel2ph


class StyleSingingBinarizer:
    def __init__(self, cfg: Any,
                 spk_encoder_vars=None, emo_encoder_vars=None):
        self.cfg = cfg
        self.processed_dir = cfg["processed_data_dir"]
        self.binary_dir = cfg["binary_data_dir"]
        self.items: Dict[str, Dict] = {}
        self.item_names: List[str] = []
        self._spk_enc = UtteranceEncoder()
        self._emo_enc = UtteranceEncoder()
        self._spk_vars = spk_encoder_vars
        self._emo_vars = emo_encoder_vars
        self.ph_encoder: Optional[TokenTextEncoder] = None

    # ---------------------------------------------------------------- meta
    def load_meta_data(self) -> None:
        meta_fn = os.path.join(self.processed_dir, "metadata.json")
        for r in json.load(open(meta_fn)):
            self.items[r["item_name"]] = r
            self.item_names.append(r["item_name"])
        self.train_names, self.test_names, self.valid_names = \
            self.split_train_test_set(self.item_names)

    def split_train_test_set(self, names: List[str]
                             ) -> Tuple[List[str], List[str], List[str]]:
        c = self.cfg
        test = [x for x in names
                if any(ts in x for ts in c["test_prefixes"])]
        valid = [x for x in names
                 if any(ts in x for ts in c["valid_prefixes"])]
        train = [x for x in names if x not in set(test)]
        return train, test, valid

    def _build_ph_encoder(self) -> TokenTextEncoder:
        fn = os.path.join(self.processed_dir, "phone_set.json")
        if os.path.exists(fn):
            phones = json.load(open(fn))
        else:
            phones = sorted({p for it in self.items.values()
                             for p in it["ph"]})
            json.dump(phones, open(fn, "w"))
        return build_token_encoder(phones)

    # ---------------------------------------------------------------- item
    def process_item(self, item: Dict) -> Optional[Dict]:
        c = self.cfg
        item = dict(item)
        wav_fn = item["wav_fn"]
        wav = load_wav(wav_fn, c["audio_sample_rate"])
        spec = wav2spec_np(
            wav, sample_rate=c["audio_sample_rate"], n_fft=c["fft_size"],
            hop_size=c["hop_size"], win_length=c["win_size"],
            n_mels=c["audio_num_mel_bins"], fmin=c["fmin"], fmax=c["fmax"])
        mel = spec["mel"]
        item["mel"] = mel
        item["wav"] = spec["wav"]
        item["len"] = mel.shape[0]
        item["sec"] = len(spec["wav"]) / c["audio_sample_rate"]
        ph = item["ph"]
        item["ph_token"] = self.ph_encoder.encode(
            " ".join(ph) if isinstance(ph, (list, tuple)) else ph)

        f0_cache = re.sub(r"\.wav$", ".npy", wav_fn)
        if os.path.exists(f0_cache):
            f0 = np.load(f0_cache)[: mel.shape[0]]
        else:
            # zero-pad the wav to a length bucket so the jitted tracker
            # compiles once per bucket instead of once per unique length
            # (a corpus has thousands of lengths; compiles dominate
            # otherwise); trailing pad frames are dropped below
            w = spec["wav"]
            bucket = 4 * c["hop_size"] * 64
            n = -(-len(w) // bucket) * bucket
            w = np.pad(w, (0, n - len(w)))
            f0 = extract_pitch(w, hop_size=c["hop_size"],
                               sample_rate=c["audio_sample_rate"])
            f0 = f0[: mel.shape[0]]
        if len(f0) < mel.shape[0]:
            f0 = np.pad(f0, (0, mel.shape[0] - len(f0)), mode="edge")
        item["f0"] = f0

        item["mel2ph"] = mel2ph_from_ph_durs(
            item["ph_durs"], mel.shape[0], c["hop_size"],
            c["audio_sample_rate"])
        return item

    def _embed(self, wav48: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Speaker + emotion d-vectors, mirroring the reference binarizer:
        the speaker embed is the native-rate wav fed straight into the
        16 kHz resemblyzer front-end (style_binarizer.py:325 — a reference
        quirk kept for checkpoint parity, cfg ``spk_embed_at_native_rate``),
        the emotion embed uses the preprocessed 16 kHz path
        (style_binarizer.py:327-329 via ``preprocess_wav``)."""
        c = self.cfg
        self._ensure_encoder_vars()
        wav16 = preprocess_wav(wav48, c["audio_sample_rate"])
        if c.get("spk_embed_at_native_rate", True):
            spk_wav = np.asarray(wav48, np.float32)
        else:
            spk_wav = wav16
        spk = self._spk_enc.embed_utterance(self._spk_vars, spk_wav,
                                            project=True)
        emo = self._emo_enc.embed_utterance(self._emo_vars, wav16,
                                            project=False)
        return spk, emo

    def _ensure_encoder_vars(self) -> None:
        """Pretrained d-vector weights when configured (reference
        ``emotion_encoder_path`` hparam, style_binarizer.py:289), random
        otherwise."""
        if self._spk_vars is not None and self._emo_vars is not None:
            return
        import jax

        from stylesinger_tpu.convert import load_ge2e_checkpoint

        probe = np.zeros((1, 160, 40), np.float32)
        if self._spk_vars is None:
            path = self.cfg.get("speaker_encoder_path") or ""
            if path and os.path.exists(path):
                self._spk_vars = load_ge2e_checkpoint(path)
            else:
                if path:
                    print(f"| WARN: speaker_encoder_path {path} missing; "
                          "random speaker-encoder weights")
                self._spk_vars = self._spk_enc.init(
                    jax.random.PRNGKey(0), probe)
        if self._emo_vars is None:
            path = self.cfg.get("emotion_encoder_path") or ""
            if path and os.path.exists(path):
                self._emo_vars = load_ge2e_checkpoint(path)
            else:
                if path:
                    print(f"| WARN: emotion_encoder_path {path} missing; "
                          "random emotion-encoder weights")
                self._emo_vars = self._emo_enc.init(
                    jax.random.PRNGKey(1), probe)

    # ------------------------------------------------------------- process
    def process(self) -> None:
        c = self.cfg
        self.load_meta_data()
        os.makedirs(self.binary_dir, exist_ok=True)
        self.ph_encoder = self._build_ph_encoder()
        shutil.copy(os.path.join(self.processed_dir, "phone_set.json"),
                    os.path.join(self.binary_dir, "phone_set.json"))
        for prefix in ("valid", "test", "train"):
            self.process_data(prefix)

    def process_data(self, prefix: str) -> None:
        c = self.cfg
        names = {"valid": self.valid_names, "test": self.test_names,
                 "train": self.train_names}[prefix]
        builder = IndexedDatasetBuilder(
            os.path.join(self.binary_dir, prefix))
        tsd = None
        if c.get("write_tsd", True):
            from stylesinger_tpu.data.native_loader import TsdWriter
            tsd = TsdWriter(os.path.join(self.binary_dir, prefix))
        lengths, total_sec = [], 0.0
        spec_min = np.full(c["audio_num_mel_bins"], np.inf, np.float32)
        spec_max = np.full(c["audio_num_mel_bins"], -np.inf, np.float32)
        ba = c["binarization_args"]
        for name in names:
            item = self.process_item(self.items[name])
            if item is None:
                print(f"| skip corrupt item {name}")
                continue
            if ba.get("with_spk_embed") or ba.get("with_emotion"):
                spk, emo = self._embed(item["wav"])
                if ba.get("with_spk_embed"):
                    item["spk_embed"] = spk
                if ba.get("with_emotion"):
                    item["emo_embed"] = emo
            if not ba.get("with_wav", False):
                item.pop("wav", None)
            lengths.append(item["len"])
            total_sec += item["sec"]
            spec_min = np.minimum(spec_min, item["mel"].min(0))
            spec_max = np.maximum(spec_max, item["mel"].max(0))
            builder.add_item(item)
            if tsd is not None:
                from stylesinger_tpu.data.tsd_dataset import (
                    precompute_item_fields,
                )
                fast = precompute_item_fields(item, c)
                tsd.add_item({k: v for k, v in fast.items()
                              if isinstance(v, (np.ndarray, list, int,
                                                float))
                              and not isinstance(v, bool)})
        builder.finalize()
        if tsd is not None:
            tsd.finalize()
        np.save(os.path.join(self.binary_dir, f"{prefix}_lengths.npy"),
                lengths)
        if prefix == "train" and lengths:
            # per-dataset diffusion normalization bounds: the reference
            # ships these as hand-made yaml tables (egs/stylesinger.yaml:
            # 142-143 spec_min/spec_max); computing them at binarize time
            # lets new datasets opt in via `use_data_spec_stats: true`
            with open(os.path.join(self.binary_dir,
                                   "spec_stats.json"), "w") as f:
                json.dump({"spec_min": spec_min.tolist(),
                           "spec_max": spec_max.tolist()}, f)
        print(f"| {prefix}: {len(lengths)} items, {total_sec:.1f}s audio")


def binarize(cfg) -> None:
    """CLI entry (reference data_gen/tts/bin/binarize.py:9-20)."""
    StyleSingingBinarizer(cfg).process()


if __name__ == "__main__":
    import argparse

    from stylesinger_tpu.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--hparams", default="")
    a = ap.parse_args()
    binarize(load_config(a.config, a.hparams))
