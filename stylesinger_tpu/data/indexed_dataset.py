"""Pickle-per-item shard storage, on-disk compatible with the reference.

Format parity target: ``IndexedDataset[Builder]``
(``utils/indexed_datasets.py:7-54`` in AaronZ345/StyleSinger):
``<path>.data`` is a concatenation of pickled items; ``<path>.idx`` is an
``np.save``d dict ``{'offsets': [0, ...]}`` of byte offsets.  Shards written
by the reference binarizer load here unchanged (and vice versa).

A small LRU cache serves repeated reads; ``pread`` on a shared fd keeps the
reader usable from multiple threads (the prefetch pipeline) without seek
races — the reference's seek+read reader is not thread-safe.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Iterator, List

import numpy as np


class IndexedDataset:
    def __init__(self, path: str, num_cache: int = 8):
        self.path = path
        idx = np.load(f"{path}.idx", allow_pickle=True).item()
        self.offsets: List[int] = list(idx["offsets"])
        self._fd = os.open(f"{path}.data", os.O_RDONLY)
        self.num_cache = num_cache
        self._cache: dict = {}

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def __getitem__(self, i: int) -> Any:
        if i < 0 or i >= len(self):
            raise IndexError(i)
        if i in self._cache:
            return self._cache[i]
        start, end = self.offsets[i], self.offsets[i + 1]
        buf = os.pread(self._fd, end - start, start)
        item = pickle.loads(buf)
        if self.num_cache > 0:
            if len(self._cache) >= self.num_cache:
                self._cache.pop(next(iter(self._cache)))
            self._cache[i] = item
        return item

    def __iter__(self) -> Iterator[Any]:
        for i in range(len(self)):
            yield self[i]

    def close(self) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class IndexedDatasetBuilder:
    def __init__(self, path: str):
        self.path = path
        self._out = open(f"{path}.data", "wb")
        self.offsets: List[int] = [0]

    def add_item(self, item: Any) -> None:
        n = self._out.write(pickle.dumps(item))
        self.offsets.append(self.offsets[-1] + n)

    def finalize(self) -> None:
        self._out.close()
        np.save(open(f"{self.path}.idx", "wb"), {"offsets": self.offsets})
