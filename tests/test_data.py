"""Data layer tests: shard IO roundtrip, bucketing, static-shape collate."""

import numpy as np
import pytest

from stylesinger_tpu.data import (
    BucketBatcher, IndexedDataset, IndexedDatasetBuilder, StyleSingerDataset,
    batch_by_size, collate_batch, pad_to,
)


def _make_items(rng, n=12):
    items = []
    for i in range(n):
        t = int(rng.integers(10, 40))
        tt = max(2, t // 4)
        items.append({
            "item_name": f"item_{i}",
            "mel": rng.standard_normal((t, 80)).astype(np.float32),
            "mel2ph": np.repeat(np.arange(1, tt + 1), 4)[:t],
            "f0": np.abs(rng.standard_normal(t)).astype(np.float32) * 100
            + 100,
            "ph_token": rng.integers(1, 30, tt),
            "ep_pitches": rng.integers(40, 80, tt),
            "ep_notedurs": rng.uniform(0.1, 0.6, tt).astype(np.float32),
            "ep_types": np.ones(tt, np.int64),
            "spk_embed": rng.standard_normal(256).astype(np.float32),
            "emo_embed": rng.standard_normal(256).astype(np.float32),
        })
    return items


def test_indexed_dataset_roundtrip(tmp_path, rng):
    items = _make_items(rng, 5)
    b = IndexedDatasetBuilder(str(tmp_path / "train"))
    for it in items:
        b.add_item(it)
    b.finalize()
    ds = IndexedDataset(str(tmp_path / "train"))
    assert len(ds) == 5
    for i in (0, 3, 1, 4, 3):
        np.testing.assert_array_equal(ds[i]["mel"], items[i]["mel"])
    ds.close()


def test_reference_format_compat(tmp_path, rng):
    """Shards written here load with the reference's np.load/pickle layout."""
    import pickle
    b = IndexedDatasetBuilder(str(tmp_path / "x"))
    b.add_item({"a": 1})
    b.add_item({"a": np.arange(3)})
    b.finalize()
    offsets = np.load(str(tmp_path / "x.idx"),
                      allow_pickle=True).item()["offsets"]
    raw = open(str(tmp_path / "x.data"), "rb").read()
    assert pickle.loads(raw[offsets[0]: offsets[1]]) == {"a": 1}
    np.testing.assert_array_equal(
        pickle.loads(raw[offsets[1]: offsets[2]])["a"], np.arange(3))


def test_batch_by_size_caps():
    sizes = [10, 10, 10, 50, 50, 100]
    batches = batch_by_size(list(range(6)), sizes, max_tokens=100)
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(6))
    for b in batches:
        assert max(sizes[i] for i in b) * len(b) <= 100 or len(b) == 1


def test_pad_to():
    a = np.ones((3, 4))
    assert pad_to(a, 5).shape == (5, 4)
    assert pad_to(a, 2).shape == (2, 4)
    np.testing.assert_array_equal(pad_to(a, 5)[3:], 0)


def test_dataset_and_collate(tmp_path, rng, tiny_cfg):
    items = _make_items(rng)
    cfg = dict(tiny_cfg)
    ds = StyleSingerDataset(cfg, "train", items=items)
    assert len(ds) == len(items)
    s = ds[0]
    assert s["mels"].shape[1] == 80
    assert s["f0"].shape == s["uv"].shape == (s["mels"].shape[0],)
    assert (s["uv"] >= 0).all()

    batch = collate_batch([ds[i] for i in range(3)],
                          frame_buckets=(32, 64), token_buckets=(8, 16))
    assert batch["mels"].shape[0] == 4  # padded to pow2
    assert batch["mels"].shape[1] in (32, 64)
    assert batch["txt_tokens"].shape[1] in (8, 16)
    assert batch["mel2ph"].shape == batch["f0"].shape
    # padding rows are fully masked
    assert (batch["txt_tokens"][3] == 0).all()


def test_bucket_batcher_epoch(rng, tiny_cfg):
    items = _make_items(rng, 10)
    cfg = dict(tiny_cfg)
    ds = StyleSingerDataset(cfg, "train", items=items)
    bb = BucketBatcher(ds, cfg, shuffle=True, seed=7, max_tokens=200,
                       max_sentences=4)
    seen = 0
    shapes = set()
    for batch in bb.batches(0):
        seen += int(batch["nsamples"])
        shapes.add(batch["mels"].shape[1:])
    assert seen == 10
    # static shape buckets only
    for s in shapes:
        assert s[0] in tuple(cfg["frame_buckets"])


def test_epoch_batches_reshuffles_per_pass(rng, tiny_cfg):
    """EpochBatches is finite per pass (scan dispatcher can materialize one
    epoch) and advances the shuffle epoch on each re-iteration (the
    streaming fallback must NOT see the same order every epoch)."""
    from stylesinger_tpu.data import EpochBatches

    items = _make_items(rng, 10)
    cfg = dict(tiny_cfg)
    cfg["seed"] = 7
    ds = StyleSingerDataset(cfg, "train", items=items)
    src = EpochBatches(ds, cfg, max_tokens=200, max_sentences=2)

    def epoch_ids():
        return [tuple(np.asarray(b["item_name"]).tolist()
                      if "item_name" in b else
                      np.asarray(b["txt_tokens"]).sum(-1).tolist())
                for b in src]

    e0, e1 = epoch_ids(), epoch_ids()
    assert src.epoch == 2
    n0 = sum(len(x) for x in e0)
    assert n0 == sum(len(x) for x in e1) > 0
    assert e0 != e1  # fresh permutation per pass


def test_bucket_batcher_sharded(rng, tiny_cfg):
    items = _make_items(rng, 10)
    cfg = dict(tiny_cfg)
    ds = StyleSingerDataset(cfg, "train", items=items)
    total = 0
    for rank in range(2):
        bb = BucketBatcher(ds, cfg, shuffle=False, rank=rank, world_size=2,
                           max_tokens=200, max_sentences=4)
        total += sum(int(b["nsamples"]) for b in bb.batches(0))
    assert total == 10
