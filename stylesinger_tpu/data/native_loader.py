"""Native tensor-shard (TSD) format: Python writer + ctypes reader binding.

The pickle-based ``IndexedDataset`` keeps on-disk compatibility with the
reference (``utils/indexed_datasets.py``); TSD is the framework's *fast
path*: a flat tensor table served by ``native/tsd_reader.cc`` — an mmap'd
zero-pickle reader with multithreaded padded-batch assembly (replacing the
reference's DataLoader worker processes, ``tasks/tts/tts_base.py:133-137``).

Layout (little-endian int64):
  .tsidx: b"TSD1" | n_items | per item: n_fields | per field:
          name_len | name | dtype_code | ndim | shape[ndim] | offset | nbytes
  .tsdata: raw array bytes, 64-byte aligned.

Falls back to a pure-numpy reader when the shared library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

_DTYPE_CODES = {
    np.dtype("float32"): 0, np.dtype("float64"): 1, np.dtype("int32"): 2,
    np.dtype("int64"): 3, np.dtype("int16"): 4, np.dtype("uint8"): 5,
    np.dtype("bool"): 6,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}
_ALIGN = 64


# ---------------------------------------------------------------------------
# writer (offline; Python is fine here)
# ---------------------------------------------------------------------------

class TsdWriter:
    def __init__(self, path: str):
        self.path = path
        self._data = open(path + ".tsdata", "wb")
        self._items: List[List[tuple]] = []
        self._pos = 0

    def add_item(self, item: Dict[str, Any]) -> None:
        fields = []
        for name, value in item.items():
            arr = np.ascontiguousarray(value)
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            if arr.dtype not in _DTYPE_CODES:
                if arr.dtype.kind in ("U", "S", "O"):
                    continue  # strings live in the sidecar meta, not TSD
                arr = arr.astype(np.float32)
            pad = (-self._pos) % _ALIGN
            if pad:
                self._data.write(b"\0" * pad)
                self._pos += pad
            off = self._pos
            raw = arr.tobytes()
            self._data.write(raw)
            self._pos += len(raw)
            fields.append((name, _DTYPE_CODES[arr.dtype], arr.shape, off,
                           len(raw)))
        self._items.append(fields)

    def finalize(self) -> None:
        self._data.close()
        with open(self.path + ".tsidx", "wb") as f:
            f.write(b"TSD1")
            f.write(struct.pack("<q", len(self._items)))
            for fields in self._items:
                f.write(struct.pack("<q", len(fields)))
                for name, code, shape, off, nbytes in fields:
                    nb = name.encode()
                    f.write(struct.pack("<q", len(nb)))
                    f.write(nb)
                    f.write(struct.pack("<q", code))
                    f.write(struct.pack("<q", len(shape)))
                    for s in shape:
                        f.write(struct.pack("<q", s))
                    f.write(struct.pack("<q", off))
                    f.write(struct.pack("<q", nbytes))


# ---------------------------------------------------------------------------
# native library
# ---------------------------------------------------------------------------

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def load_native() -> Optional[ctypes.CDLL]:
    """Build (once) and load libtsd.so; None if the toolchain is absent."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    nd = _native_dir()
    so = os.path.join(nd, "build", "libtsd.so")
    try:
        if not os.path.exists(so) or (
                os.path.getmtime(so) <
                os.path.getmtime(os.path.join(nd, "tsd_reader.cc"))):
            subprocess.run(["make", "-C", nd], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
    except Exception:
        _LIB_FAILED = True
        return None
    lib.tsd_open.restype = ctypes.c_void_p
    lib.tsd_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.tsd_close.argtypes = [ctypes.c_void_p]
    lib.tsd_num_items.restype = ctypes.c_int64
    lib.tsd_num_items.argtypes = [ctypes.c_void_p]
    lib.tsd_field_info.restype = ctypes.c_int
    lib.tsd_field_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.tsd_read_field.restype = ctypes.c_int
    lib.tsd_read_field.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_char_p, ctypes.c_void_p]
    lib.tsd_gather_pad.restype = ctypes.c_int
    lib.tsd_gather_pad.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int]
    lib.tsd_prefetch.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.c_int64]
    _LIB = lib
    return lib


class TsdReader:
    """Random access + padded batch gather over a TSD shard pair."""

    def __init__(self, path: str, n_threads: int = 4):
        self.path = path
        self.n_threads = n_threads
        self._lib = load_native()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.tsd_open(
                (path + ".tsidx").encode(), (path + ".tsdata").encode())
            if not self._h:
                self._lib = None
        if self._lib is None:  # pure-python fallback
            self._py_index = self._parse_index(path + ".tsidx")
            self._py_data = np.memmap(path + ".tsdata", dtype=np.uint8,
                                      mode="r")

    @staticmethod
    def _parse_index(idx_path: str):
        buf = open(idx_path, "rb").read()
        assert buf[:4] == b"TSD1"
        pos = 4

        def rd():
            nonlocal pos
            v = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
            return v

        items = []
        for _ in range(rd()):
            fields = {}
            for _ in range(rd()):
                nl = rd()
                name = buf[pos: pos + nl].decode()
                pos += nl
                code = rd()
                ndim = rd()
                shape = tuple(rd() for _ in range(ndim))
                off = rd()
                nbytes = rd()
                fields[name] = (code, shape, off, nbytes)
            items.append(fields)
        return items

    def __len__(self) -> int:
        if self._h:
            return int(self._lib.tsd_num_items(self._h))
        return len(self._py_index)

    def field(self, item: int, name: str) -> np.ndarray:
        if self._h:
            dtype = ctypes.c_int64()
            ndim = ctypes.c_int64()
            shape8 = (ctypes.c_int64 * 8)()
            nbytes = ctypes.c_int64()
            rc = self._lib.tsd_field_info(
                self._h, item, name.encode(), ctypes.byref(dtype),
                ctypes.byref(ndim), shape8, ctypes.byref(nbytes))
            if rc != 0:
                raise KeyError((item, name))
            shape = tuple(shape8[i] for i in range(ndim.value))
            out = np.empty(shape, dtype=_CODE_DTYPES[dtype.value])
            rc = self._lib.tsd_read_field(
                self._h, item, name.encode(),
                out.ctypes.data_as(ctypes.c_void_p))
            assert rc == 0
            return out
        code, shape, off, nbytes = self._py_index[item][name]
        arr = np.frombuffer(self._py_data[off: off + nbytes],
                            dtype=_CODE_DTYPES[code])
        return arr.reshape(shape).copy()

    def gather_pad(self, items: Sequence[int], name: str,
                   max_rows: int) -> np.ndarray:
        """[len(items), max_rows, *trailing] zero-padded batch of a field
        (leading dim padded/truncated to max_rows); native multithreaded."""
        items = np.asarray(items, np.int64)
        code, shape, _, _ = self._probe(int(items[0]), name)
        trailing = shape[1:]
        dtype = _CODE_DTYPES[code]
        row_bytes = int(np.prod(trailing, dtype=np.int64) *
                        dtype.itemsize) if trailing else dtype.itemsize
        out = np.zeros((len(items), max_rows) + tuple(trailing), dtype)
        if self._h:
            rc = self._lib.tsd_gather_pad(
                self._h, items.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)), len(items),
                name.encode(), out.ctypes.data_as(ctypes.c_void_p),
                max_rows, row_bytes, self.n_threads)
            if rc != 0:
                raise KeyError(f"gather_pad failed at position {-rc - 1}")
        else:
            for i, idx in enumerate(items):
                arr = self.field(int(idx), name)
                r = min(arr.shape[0], max_rows)
                out[i, :r] = arr[:r]
        return out

    def prefetch(self, items: Sequence[int]) -> None:
        if self._h:
            items = np.asarray(items, np.int64)
            self._lib.tsd_prefetch(
                self._h, items.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)), len(items))

    def _probe(self, item: int, name: str):
        if self._h:
            dtype = ctypes.c_int64()
            ndim = ctypes.c_int64()
            shape8 = (ctypes.c_int64 * 8)()
            nbytes = ctypes.c_int64()
            rc = self._lib.tsd_field_info(
                self._h, item, name.encode(), ctypes.byref(dtype),
                ctypes.byref(ndim), shape8, ctypes.byref(nbytes))
            if rc != 0:
                raise KeyError((item, name))
            return (dtype.value,
                    tuple(shape8[i] for i in range(ndim.value)), 0,
                    nbytes.value)
        return self._py_index[item][name]

    def close(self) -> None:
        if self._h:
            self._lib.tsd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def convert_indexed_to_tsd(indexed_path: str, tsd_path: str) -> int:
    """One-shot migration: reference pickle shards -> TSD fast path."""
    from stylesinger_tpu.data.indexed_dataset import IndexedDataset

    ds = IndexedDataset(indexed_path, num_cache=0)
    w = TsdWriter(tsd_path)
    n = 0
    for item in ds:
        w.add_item({k: v for k, v in item.items()
                    if isinstance(v, (np.ndarray, int, float, list))})
        n += 1
    w.finalize()
    return n
