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


def test_tsd_dataset_and_prefetch(tmp_path, rng):
    """Full fast path: binarize-style TSD shard -> native batches match the
    Python dataset's content; prefetch iterator covers the epoch."""
    from stylesinger_tpu.config import tiny_test_config
    from stylesinger_tpu.data.tsd_dataset import (
        PrefetchBatcher, TsdStyleSingerDataset, precompute_item_fields,
    )

    cfg = tiny_test_config(max_frames=64)
    w = TsdWriter(str(tmp_path / "train"))
    items = []
    for i in range(6):
        t = int(rng.integers(12, 40))
        tt = max(2, t // 4)
        it = {
            "mel": rng.standard_normal(
                (t, cfg["audio_num_mel_bins"])).astype(np.float32),
            "mel2ph": np.repeat(np.arange(1, tt + 1), 4)[:t],
            "f0": np.abs(rng.standard_normal(t)).astype(np.float32) * 100
            + 150,
            "ph_token": rng.integers(1, 20, tt),
            "ep_pitches": rng.integers(40, 80, tt),
            "ep_notedurs": rng.uniform(0.1, 0.6, tt).astype(np.float32),
            "ep_types": np.ones(tt, np.int64),
            "spk_embed": rng.standard_normal(256).astype(np.float32),
            "emo_embed": rng.standard_normal(256).astype(np.float32),
        }
        items.append(it)
        w.add_item(precompute_item_fields(it, cfg))
    w.finalize()

    ds = TsdStyleSingerDataset(cfg, str(tmp_path / "train"))
    assert len(ds) == 6
    batch = ds.batch([0, 2, 4])
    assert batch["mels"].shape[0] == 4  # pow2 padding
    assert batch["mels"].shape[1] in tuple(cfg["frame_buckets"])
    t0 = items[0]["mel"].shape[0]
    np.testing.assert_array_equal(batch["mels"][0, :t0], items[0]["mel"])
    assert (batch["txt_tokens"][3] == 0).all()  # padding row masked

    bb = PrefetchBatcher(ds, cfg, shuffle=True, seed=3)
    seen = sum(int(b["nsamples"]) for b in bb.batches(0))
    assert seen == 6
