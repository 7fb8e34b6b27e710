"""Native TSD loader: write/read roundtrip, padded gather, pickle migration."""

import numpy as np
import pytest

from stylesinger_tpu.data.indexed_dataset import IndexedDatasetBuilder
from stylesinger_tpu.data.native_loader import (
    TsdReader, TsdWriter, convert_indexed_to_tsd, load_native,
)


def _items(rng, n=6):
    out = []
    for i in range(n):
        t = int(rng.integers(5, 20))
        out.append({
            "mel": rng.standard_normal((t, 8)).astype(np.float32),
            "f0": rng.standard_normal(t).astype(np.float32),
            "tokens": rng.integers(1, 30, t // 2 + 1),
            "spk_embed": rng.standard_normal(16).astype(np.float32),
        })
    return out


def test_native_lib_builds():
    assert load_native() is not None, "libtsd.so failed to build"


def test_tsd_roundtrip(tmp_path, rng):
    items = _items(rng)
    w = TsdWriter(str(tmp_path / "train"))
    for it in items:
        w.add_item(it)
    w.finalize()

    r = TsdReader(str(tmp_path / "train"))
    assert len(r) == len(items)
    for i in (0, 3, 5, 2):
        for k in ("mel", "f0", "tokens", "spk_embed"):
            np.testing.assert_array_equal(r.field(i, k), items[i][k])
    r.close()


def test_tsd_gather_pad(tmp_path, rng):
    items = _items(rng)
    w = TsdWriter(str(tmp_path / "x"))
    for it in items:
        w.add_item(it)
    w.finalize()
    r = TsdReader(str(tmp_path / "x"))
    idxs = [0, 2, 4]
    batch = r.gather_pad(idxs, "mel", max_rows=24)
    assert batch.shape == (3, 24, 8)
    for bi, i in enumerate(idxs):
        t = items[i]["mel"].shape[0]
        np.testing.assert_array_equal(batch[bi, :t], items[i]["mel"])
        assert (batch[bi, t:] == 0).all()
    # truncation path
    short = r.gather_pad(idxs, "mel", max_rows=4)
    for bi, i in enumerate(idxs):
        np.testing.assert_array_equal(short[bi], items[i]["mel"][:4])
    r.prefetch(idxs)  # smoke: madvise path
    r.close()


def test_python_fallback_matches_native(tmp_path, rng):
    items = _items(rng, 3)
    w = TsdWriter(str(tmp_path / "y"))
    for it in items:
        w.add_item(it)
    w.finalize()
    rn = TsdReader(str(tmp_path / "y"))
    rp = TsdReader.__new__(TsdReader)
    rp.path = str(tmp_path / "y")
    rp.n_threads = 1
    rp._lib = None
    rp._h = None
    rp._py_index = TsdReader._parse_index(str(tmp_path / "y") + ".tsidx")
    rp._py_data = np.memmap(str(tmp_path / "y") + ".tsdata",
                            dtype=np.uint8, mode="r")
    for i in range(3):
        np.testing.assert_array_equal(rn.field(i, "mel"), rp.field(i, "mel"))
    np.testing.assert_array_equal(rn.gather_pad([0, 2], "f0", 16),
                                  rp.gather_pad([0, 2], "f0", 16))
    rn.close()


def test_convert_indexed_to_tsd(tmp_path, rng):
    items = _items(rng, 4)
    b = IndexedDatasetBuilder(str(tmp_path / "old"))
    for it in items:
        b.add_item(it)
    b.finalize()
    n = convert_indexed_to_tsd(str(tmp_path / "old"), str(tmp_path / "new"))
    assert n == 4
    r = TsdReader(str(tmp_path / "new"))
    np.testing.assert_array_equal(r.field(1, "mel"), items[1]["mel"])
    r.close()
