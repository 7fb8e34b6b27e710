"""Checkpoint save/restore roundtrip + test-split synthesis runner."""

import os

import jax
import numpy as np
import pytest

from stylesinger_tpu.data import StyleSingerDataset, collate_batch
from stylesinger_tpu.models.stylesinger import StyleSinger
from stylesinger_tpu.training import init_state
from stylesinger_tpu.training.checkpoint import CheckpointManager
from stylesinger_tpu.training.test_runner import TestRunner as SynthRunner

VOCAB = 20


def _items(cfg, rng, n=3):
    items = []
    for i in range(n):
        t = int(rng.integers(16, 30))
        tt = max(2, t // 4)
        items.append({
            "item_name": f"i{i}",
            "mel": rng.standard_normal(
                (t, cfg["audio_num_mel_bins"])).astype(np.float32) * .5 - 2,
            "mel2ph": np.repeat(np.arange(1, tt + 1), 4)[:t],
            "f0": np.abs(rng.standard_normal(t)).astype(np.float32) * 100
            + 150,
            "ph_token": rng.integers(1, VOCAB, tt),
            "ep_pitches": rng.integers(40, 80, tt),
            "ep_notedurs": rng.uniform(0.1, 0.6, tt).astype(np.float32),
            "ep_types": np.ones(tt, np.int64),
            "spk_embed": rng.standard_normal(256).astype(np.float32),
            "emo_embed": rng.standard_normal(256).astype(np.float32),
        })
    return items


def _batch(cfg, rng, n=3):
    ds = StyleSingerDataset(cfg, "train", items=_items(cfg, rng, n))
    return collate_batch([ds[i] for i in range(n)], cfg["frame_buckets"],
                         cfg["token_buckets"])


def test_checkpoint_roundtrip(tmp_path, tiny_cfg, rng):
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _batch(cfg, rng)
    batch.pop("nsamples")
    state = init_state(model, cfg, batch)

    mgr = CheckpointManager(str(tmp_path), keep=2, save_best=True)
    mgr.save(100, state, val_loss=1.5)
    mgr.save(200, state, val_loss=1.2)
    assert mgr.latest_step() == 200

    state2 = init_state(model, cfg, batch,
                        rng=jax.random.PRNGKey(999))  # different init
    state2, step = mgr.restore(state2)
    assert step == 200
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_keep_k_prunes_oldest_not_worst(tmp_path, tiny_cfg, rng):
    """Regression: with a best_fn on the periodic manager, orbax keeps the
    best-K BY METRIC and deletes the newest step, breaking resume. The
    reference keeps the K most recent + a separate best copy
    (utils/trainer.py:400-413)."""
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _batch(cfg, rng)
    batch.pop("nsamples")
    state = init_state(model, cfg, batch)

    mgr = CheckpointManager(str(tmp_path), keep=2, save_best=True)
    mgr.save(100, state, val_loss=0.5)   # best val
    mgr.save(200, state, val_loss=1.0)
    mgr.save(300, state, val_loss=2.0)   # worst val but most recent
    assert mgr.latest_step() == 300      # resume must see the newest
    assert mgr.best_step() == 100        # best copy preserved separately
    _, step = mgr.restore_best(init_state(model, cfg, batch,
                                          rng=jax.random.PRNGKey(1)))
    assert step == 100


def test_test_runner_writes_artifacts(tmp_path, tiny_cfg, rng):
    from stylesinger_tpu.vocoder_infer import HifiGAN_NSF

    cfg = dict(tiny_cfg)
    cfg.update(max_frames=64, hop_size=64)
    model = StyleSinger(cfg, VOCAB)
    batch = _batch(cfg, rng)
    nb = {k: v for k, v in batch.items() if k != "nsamples"}
    state = init_state(model, cfg, nb)
    variables = {"params": state.params, "codebook": state.codebook}

    vocoder = HifiGAN_NSF(cfg)
    runner = SynthRunner(model, cfg, vocoder, str(tmp_path))
    gen_dir = runner.run(variables, [batch])

    wavs = os.listdir(os.path.join(gen_dir, "wavs"))
    assert any(w.endswith(".wav") and "_gt" not in w for w in wavs)
    assert any(w.endswith("_gt.wav") for w in wavs)
    assert os.path.exists(os.path.join(gen_dir, "meta.csv"))
    assert os.path.exists(os.path.join(gen_dir, "result_f0s.npy"))
    rows = open(os.path.join(gen_dir, "meta.csv")).read().strip().split("\n")
    assert len(rows) >= 2  # header + >=1 item


def test_best_baseline_survives_reopen(tmp_path, tiny_cfg, rng):
    """ADVICE r1: on resume the best-val baseline must be recovered (orbax
    metrics or the best_val.json sidecar) so a worse validation can never
    overwrite the best copy."""
    import json
    import os

    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _batch(cfg, rng)
    batch.pop("nsamples")
    state = init_state(model, cfg, batch)

    mgr = CheckpointManager(str(tmp_path), keep=2, save_best=True)
    mgr.save(100, state, val_loss=0.5)
    sidecar = os.path.join(str(tmp_path), "ckpt_best", "best_val.json")
    assert json.load(open(sidecar))["val_loss"] == 0.5

    # reopen (simulated resume): baseline known again, worse val refused
    mgr2 = CheckpointManager(str(tmp_path), keep=2, save_best=True)
    assert mgr2._best == 0.5
    mgr2.save(200, state, val_loss=0.9)
    assert mgr2.best_step() == 100
    mgr2.save(300, state, val_loss=0.3)
    assert mgr2.best_step() == 300


def test_unreadable_best_metric_preserved_as_legacy(tmp_path, tiny_cfg,
                                                    rng):
    """Review r3: when an existing best copy's metric is unreadable, the
    artifact is moved aside (ckpt_best_legacy) — a noisy first validation
    must never cause its deletion — and best-tracking restarts fresh with
    a sidecar that describes the stored copy."""
    import json
    import os

    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _batch(cfg, rng)
    batch.pop("nsamples")
    state = init_state(model, cfg, batch)

    mgr = CheckpointManager(str(tmp_path), keep=2, save_best=True)
    mgr.save(100, state, val_loss=0.5)
    # wipe both metric sources (simulates a pre-sidecar checkpoint)
    os.remove(os.path.join(str(tmp_path), "ckpt_best", "best_val.json"))
    import shutil
    for root, dirs, files in os.walk(os.path.join(str(tmp_path),
                                                  "ckpt_best")):
        for f in files:
            if "metrics" in f or f.endswith(".json"):
                os.remove(os.path.join(root, f))

    mgr2 = CheckpointManager(str(tmp_path), keep=2, save_best=True)
    legacy = os.path.join(str(tmp_path), "ckpt_best_legacy")
    assert os.path.isdir(legacy)            # old artifact preserved
    assert mgr2.best_step() is None         # fresh tracking
    mgr2.save(200, state, val_loss=2.0)     # noisy first val becomes best
    assert mgr2.best_step() == 200
    sidecar = os.path.join(str(tmp_path), "ckpt_best", "best_val.json")
    assert json.load(open(sidecar)) == {"step": 200, "val_loss": 2.0}
    mgr2.save(300, state, val_loss=1.5)
    assert mgr2.best_step() == 300          # beaten normally
    assert os.path.isdir(legacy)            # legacy never touched


def test_milestone_snapshots_survive_keep_k(tmp_path, tiny_cfg, rng):
    """Milestones are permanent eval-only snapshots for cross-run quality
    sweeps (e.g. validation FFE vs training step): keep-K pruning must not
    touch them, and restore_milestone loads params/codebook by step."""
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _batch(cfg, rng)
    batch.pop("nsamples")
    state = init_state(model, cfg, batch)

    mgr = CheckpointManager(str(tmp_path), keep=1, save_best=False,
                            milestone_interval=100)
    first_w = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    mgr.save(100, state)                    # milestone
    state = state.replace(params=jax.tree_util.tree_map(
        lambda x: x + 1.0, state.params))
    mgr.save(150, state)                    # not a milestone
    mgr.save(200, state)                    # milestone (mutated params)
    assert mgr.milestone_steps() == [100, 200]
    assert mgr.latest_step() == 200         # keep-1 pruned 100/150

    # read-only listing from a fresh manager (the sweep tool's view)
    ro = CheckpointManager(str(tmp_path), keep=1, save_best=False)
    assert ro.milestone_steps() == [100, 200]
    s100 = ro.restore_milestone(init_state(model, cfg, batch,
                                           rng=jax.random.PRNGKey(7)), 100)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(s100.params)[0]), first_w)
    s200 = ro.restore_milestone(s100, 200)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(s200.params)[0]), first_w + 1.0)
