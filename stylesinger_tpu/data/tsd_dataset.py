"""TSD-backed fast dataset: native batch assembly + background prefetch.

The hot-path twin of ``StyleSingerDataset``: per-item transforms
(norm-interp F0) are precomputed at binarize time into the TSD shard, so a
training batch is pure padded gathers executed by the C++ reader's thread
pool (``native/tsd_reader.cc``), overlapped with device compute by a
one-batch-deep background prefetcher (replacing the reference's DataLoader
worker processes, ``tasks/tts/tts_base.py:133-137``).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np

from stylesinger_tpu.data.batching import (
    _next_bucket, _next_pow2, batch_by_size,
)
from stylesinger_tpu.data.native_loader import TsdReader
from stylesinger_tpu.dsp.pitch import norm_interp_f0_np


def precompute_item_fields(item: Dict, cfg: Any) -> Dict:
    """Binarize-time hook: add normed f0/uv so the loader is transform-free."""
    f0, uv = norm_interp_f0_np(
        np.asarray(item["f0"], np.float32),
        pitch_norm=cfg["pitch_norm"], use_uv=cfg["use_uv"],
        f0_mean=cfg["f0_mean"], f0_std=cfg["f0_std"])
    out = dict(item)
    out["f0_norm"] = f0
    out["uv"] = uv
    return out


class TsdStyleSingerDataset:
    """Batch-level access over a TSD shard pair (no per-item Python)."""

    FIELD_DTYPES = {
        "ph_token": np.int32, "ep_pitches": np.int32, "ep_types": np.int32,
        "mel2ph": np.int32,
    }

    def __init__(self, cfg: Any, path: str, n_threads: int = 4):
        self.cfg = cfg
        self.reader = TsdReader(path, n_threads=n_threads)
        self.sizes = [int(self.reader._probe(i, "mel")[1][0])
                      for i in range(len(self.reader))]

    def __len__(self) -> int:
        return len(self.reader)

    def gather(self, idxs, name: str, max_rows: int,
               out_name: Optional[str] = None,
               dtype=None) -> np.ndarray:
        arr = self.reader.gather_pad(idxs, name, max_rows)
        if dtype is not None:
            arr = arr.astype(dtype)
        return arr

    def batch(self, idxs) -> Dict[str, np.ndarray]:
        c = self.cfg
        sizes = [self.sizes[i] for i in idxs]
        t_mel = _next_bucket(min(max(sizes), c["max_frames"]),
                             c["frame_buckets"])
        tt = [int(self.reader._probe(i, "ph_token")[1][0]) for i in idxs]
        t_txt = _next_bucket(min(max(tt), c["max_input_tokens"]),
                             c["token_buckets"])
        b = _next_pow2(len(idxs))
        pad = list(idxs) + [idxs[0]] * (b - len(idxs))  # rows masked below
        g = self.reader.gather_pad
        batch = {
            "txt_tokens": g(pad, "ph_token", t_txt).astype(np.int32),
            "mels": g(pad, "mel", t_mel).astype(np.float32),
            "mel2ph": g(pad, "mel2ph", t_mel).astype(np.int32),
            "f0": g(pad, "f0_norm", t_mel).astype(np.float32),
            "uv": g(pad, "uv", t_mel).astype(np.float32),
            "notes": g(pad, "ep_pitches", t_txt).astype(np.int32),
            "note_durs": g(pad, "ep_notedurs", t_txt).astype(np.float32),
            "note_types": g(pad, "ep_types", t_txt).astype(np.int32),
            "spk_embed": g(pad, "spk_embed", 256).astype(np.float32)
            if self._has("spk_embed", idxs[0]) else None,
            "emo_embed": g(pad, "emo_embed", 256).astype(np.float32)
            if self._has("emo_embed", idxs[0]) else None,
            "nsamples": np.asarray(len(idxs)),
        }
        batch = {k: v for k, v in batch.items() if v is not None}
        # zero out the pow2 padding rows so masks see pure padding
        for k, v in batch.items():
            if k != "nsamples" and v.ndim >= 1 and v.shape[0] == b:
                v[len(idxs):] = 0
        return batch

    def _has(self, name: str, idx: int) -> bool:
        try:
            self.reader._probe(idx, name)
            return True
        except KeyError:
            return False


class PrefetchBatcher:
    """Size-bucketed batches assembled natively, prefetched one deep on a
    background thread (madvise readahead + C++ gather overlap the device
    step)."""

    def __init__(self, dataset: TsdStyleSingerDataset, cfg: Any,
                 shuffle: bool = True, seed: int = 1234, rank: int = 0,
                 world_size: int = 1, depth: int = 2):
        self.ds = dataset
        self.cfg = cfg
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.depth = depth

    def _index_batches(self, epoch: int):
        sizes = np.asarray(self.ds.sizes)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            order = rng.permutation(len(sizes))
            order = order[np.argsort(sizes[order], kind="mergesort")]
        else:
            order = np.arange(len(sizes))
        batches = batch_by_size(order.tolist(), self.ds.sizes,
                                self.cfg["max_tokens"],
                                self.cfg["max_sentences"])
        if self.shuffle:
            rng = np.random.default_rng(self.seed + 1000 + epoch)
            rng.shuffle(batches)
        return batches[self.rank:: self.world_size]

    def batches(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        idx_batches = self._index_batches(epoch)
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = object()

        def producer():
            for i, idxs in enumerate(idx_batches):
                if i + 1 < len(idx_batches):
                    self.ds.reader.prefetch(idx_batches[i + 1])
                q.put(self.ds.batch(idxs))
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()
