"""Training stack tests: losses, schedule, and a sharded end-to-end step
on the virtual 8-device CPU mesh (SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylesinger_tpu.data import StyleSingerDataset, collate_batch
from stylesinger_tpu.parallel import make_mesh, shard_batch
from stylesinger_tpu.training import (
    Phase, compute_losses, duration_losses, init_state, make_train_step,
    mel_losses, phase_for_step, rsqrt_schedule, ssim,
)
from stylesinger_tpu.models.stylesinger import StyleSinger

VOCAB = 20


# ----------------------------------------------------------------- losses

def test_ssim_identity():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 24, 24)) * 4
    s = np.asarray(ssim(x, x))
    assert s.mean() > 0.99


def test_ssim_separable_filter_matches_conv2d():
    """The shifted-add separable gaussian filter (TPU-friendly) must equal
    the dense 11x11 depthwise conv2d of the torch formulation."""
    from stylesinger_tpu.training.losses import _filter2d, _gaussian_kernel
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 80))
    kern = jnp.asarray(_gaussian_kernel())
    dense = jax.lax.conv_general_dilated(
        x[:, None], kern[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))[:, 0]
    np.testing.assert_allclose(np.asarray(_filter2d(x)), np.asarray(dense),
                               atol=1e-5)


def test_mel_losses_zero_for_equal():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 80))
    out = mel_losses(x, x, "l1:0.5|ssim:0.5")
    assert abs(float(out["l1"])) < 1e-6
    assert abs(float(out["ssim"])) < 1e-3


def test_duration_losses_zero_for_perfect(tiny_cfg):
    tokens = jnp.asarray([[1, 2, 3, 0]])
    mel2ph = jnp.asarray([[1, 1, 2, 3, 3, 3, 0, 0]])
    dur_gt = jnp.asarray([[2.0, 1.0, 3.0, 0.0]])
    log_dur = jnp.log(dur_gt + 1)
    out = duration_losses(log_dur, mel2ph, tokens, dict(tiny_cfg))
    assert abs(float(out["pdur"])) < 1e-6
    assert abs(float(out["sdur"])) < 1e-6


def test_rsqrt_schedule():
    s = rsqrt_schedule(2.0, 100, 256)
    lrs = [float(s(t)) for t in (1, 50, 100, 400)]
    assert lrs[0] < lrs[1] < lrs[2]      # warmup rises
    assert lrs[3] < lrs[2]               # decay falls
    np.testing.assert_allclose(lrs[2], 2.0 * 100 ** -0.5 * 256 ** -0.5,
                               rtol=1e-5)


def test_phase_for_step(tiny_cfg):
    c = dict(tiny_cfg)
    c.update(rq_start=100, forcing=50, diff_start=200, decoder="diffsinger")
    assert phase_for_step(0, c) == Phase(False, True, False)
    assert phase_for_step(60, c) == Phase(False, False, False)
    assert phase_for_step(150, c) == Phase(True, False, False)
    assert phase_for_step(300, c) == Phase(True, False, True)


# ------------------------------------------------------- end-to-end step

def _synthetic_batch(cfg, rng, n=4):
    items = []
    for i in range(n):
        t = int(rng.integers(16, 30))
        tt = max(2, t // 4)
        items.append({
            "item_name": f"i{i}",
            "mel": rng.standard_normal((t, cfg["audio_num_mel_bins"])).astype(np.float32) * 0.5 - 2,
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
    ds = StyleSingerDataset(cfg, "train", items=items)
    return collate_batch([ds[i] for i in range(n)],
                         cfg["frame_buckets"], cfg["token_buckets"])


def test_train_step_on_mesh(tiny_cfg, rng):
    assert jax.device_count() == 8
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=8)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    sbatch = shard_batch(batch, mesh)

    state = init_state(model, cfg, batch)
    # snapshot before the (donated) step invalidates the old buffers
    param_leaf0 = np.asarray(jax.tree_util.tree_leaves(state.params)[-1])
    cb0 = np.asarray(jax.tree_util.tree_leaves(state.codebook)[0])

    step_fn = make_train_step(model, cfg)
    phase = Phase(use_rq=True, forcing=False, use_diff=True)
    state2, metrics = step_fn(state, sbatch, jax.random.PRNGKey(0), phase)

    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params actually moved; codebook EMA updated
    param_leaf1 = np.asarray(jax.tree_util.tree_leaves(state2.params)[-1])
    cb1 = np.asarray(jax.tree_util.tree_leaves(state2.codebook)[0])
    assert not np.allclose(param_leaf0, param_leaf1)
    assert not np.allclose(cb0, cb1)


def test_vocoder_gan_steps(tiny_cfg, rng):
    """One generator + one discriminator GAN step (vocoder training)."""
    from stylesinger_tpu.training.vocoder_task import (
        crop_batch, init_vocoder_state, make_vocoder_steps,
    )

    cfg = dict(tiny_cfg)
    cfg.update(hop_size=64, fft_size=256, win_size=256,
               audio_num_mel_bins=16, fmax=8000, audio_sample_rate=16000)
    hop = 64
    items = []
    for i in range(2):
        t = 40
        items.append({
            "mel": rng.standard_normal((t, 16)).astype(np.float32),
            "wav": rng.standard_normal(t * hop).astype(np.float32) * 0.3,
            "f0": np.full(t, 200.0, np.float32),
        })
    batch = crop_batch(items, cfg, rng, crop_frames=16)
    assert batch["wav"].shape == (2, 16 * hop)

    state = init_vocoder_state(cfg, jax.random.PRNGKey(0),
                               jnp.asarray(batch["mels"]),
                               jnp.asarray(batch["f0"]))
    gen_step, disc_step = make_vocoder_steps(cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state, dm = disc_step(state, jb, jax.random.PRNGKey(1))
    state, gm = gen_step(state, jb, jax.random.PRNGKey(2))
    for k, v in {**dm, **gm}.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 1


def test_trainer_fit_smoke(tmp_path, tiny_cfg, rng):
    """Two optimizer steps through the Trainer loop: metrics + checkpoint."""
    import os

    from stylesinger_tpu.training.trainer import Trainer

    cfg = dict(tiny_cfg)
    cfg.update(max_frames=64, max_updates=2, val_check_interval=2,
               tb_log_interval=1, valid_infer_interval=10 ** 9,
               num_ckpt_keep=1)
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=4)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}

    trainer = Trainer(model, cfg, str(tmp_path))
    state = trainer.fit([batch, batch, batch],
                        valid_batches_fn=lambda: iter([batch]),
                        example_batch=batch)
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "metrics.jsonl")
    lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) >= 2
    assert trainer.ckpt.latest_step() == 2


def test_fs2_task_step(tiny_cfg, rng):
    from stylesinger_tpu.models.fs2 import FastSpeech2
    from stylesinger_tpu.training.fs2_task import (
        init_fs2_state, make_fs2_train_step,
    )

    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = FastSpeech2(cfg, VOCAB, out_dims=cfg["audio_num_mel_bins"])
    batch = _synthetic_batch(cfg, rng, n=2)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = init_fs2_state(model, cfg, batch)
    step_fn = make_fs2_train_step(model, cfg)
    state, losses = step_fn(state, batch, jax.random.PRNGKey(0))
    assert int(state.step) == 1
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_pe_task_step(tiny_cfg, rng):
    from stylesinger_tpu.models.pe import PitchExtractor
    from stylesinger_tpu.training.fs2_task import make_pe_train_step
    from stylesinger_tpu.training.step import TrainState, make_optimizer

    cfg = dict(tiny_cfg)
    model = PitchExtractor(cfg)
    mel = jnp.asarray(rng.standard_normal(
        (2, 24, cfg["audio_num_mel_bins"])).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(7, 9, (2, 24)).astype(np.float32))
    uv = jnp.zeros((2, 24))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, mel)
    state = TrainState.create(v["params"], {}, make_optimizer(cfg))
    step_fn = make_pe_train_step(model, cfg)
    state, losses = step_fn(state, {"mels": mel, "f0": f0, "uv": uv},
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))


def test_training_loss_decreases(tiny_cfg, rng):
    """30 optimizer steps on a fixed tiny batch: total loss must drop
    (end-to-end learning signal through every submodule)."""
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    cfg["warmup_updates"] = 5
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=8)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}

    mesh = make_mesh()
    sbatch = shard_batch(batch, mesh)
    state = init_state(model, cfg, batch)
    step_fn = make_train_step(model, cfg)
    phase = Phase(use_rq=True, forcing=False, use_diff=True)
    rng_j = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, m = step_fn(state, sbatch, rng_j, phase)
        losses.append(float(m["total_loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first, (first, last)


def test_sharded_batched_inference(tiny_cfg, rng):
    """Serving path: batched zero-shot inference sharded over the 8-device
    mesh (batch axis on 'data'); per-item outputs match device count."""
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=8)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}
    state = init_state(model, cfg, batch)
    variables = {"params": state.params, "codebook": state.codebook}

    mesh = make_mesh()
    sb = shard_batch(batch, mesh)

    @jax.jit
    def serve(variables, b, rng):
        ret = model.apply(
            variables, b["txt_tokens"], None, b["spk_embed"],
            b["emo_embed"], b["mels"], b["f0"], None, None, b["notes"],
            b["note_durs"], b["note_types"], infer=True, use_diff=True,
            max_frames=64, rngs={"diffusion": rng, "rq": rng})
        return ret["mel_out"], ret["f0_denorm"]

    mel, f0 = serve(variables, sb, jax.random.PRNGKey(0))
    assert mel.shape == (8, 64, cfg["audio_num_mel_bins"])
    assert np.isfinite(np.asarray(mel)).all()


def test_train_step_on_2d_mesh(tiny_cfg, rng):
    """('data','model') 2D mesh (4x2): the tp-ready layout compiles and
    steps with the model axis present."""
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=4)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    sbatch = shard_batch(batch, mesh)
    state = init_state(model, cfg, batch)
    step_fn = make_train_step(model, cfg)
    state, m = step_fn(state, sbatch, jax.random.PRNGKey(0),
                       Phase(True, False, True))
    assert np.isfinite(float(m["total_loss"]))


def test_grad_accumulation(tiny_cfg, rng):
    """optax.MultiSteps path (reference accumulate_grad_batches)."""
    cfg = dict(tiny_cfg)
    cfg.update(max_frames=64, accumulate_grad_batches=2)
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=2)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k != "nsamples"}
    state = init_state(model, cfg, batch)
    leaf0 = np.asarray(jax.tree_util.tree_leaves(state.params)[-1]).copy()
    step_fn = make_train_step(model, cfg)
    phase = Phase(True, False, True)
    # first micro-step: accumulate only, params unchanged
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0), phase)
    leaf1 = np.asarray(jax.tree_util.tree_leaves(state.params)[-1])
    np.testing.assert_array_equal(leaf0, leaf1)
    # second micro-step: apply
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0), phase)
    leaf2 = np.asarray(jax.tree_util.tree_leaves(state.params)[-1])
    assert not np.allclose(leaf0, leaf2)

def test_bf16_train_step(tiny_cfg, rng):
    """compute_dtype=bfloat16 (egs recipe AMP analogue): the mixed-precision
    step produces finite losses close to the f32 step's, and the loss still
    decreases over 20 steps (params/optimizer/LN-stats/loss math stay f32)."""
    base = dict(tiny_cfg)
    base["max_frames"] = 64
    base["warmup_updates"] = 5
    model = StyleSinger(base, VOCAB)
    batch = _synthetic_batch(base, rng, n=2)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "nsamples"}
    phase = Phase(use_rq=True, forcing=False, use_diff=True)

    losses, gnorms = {}, {}
    for dtype in ("float32", "bfloat16"):
        cfg = dict(base, compute_dtype=dtype)
        state = init_state(model, cfg, batch)
        step_fn = make_train_step(model, cfg)
        series = []
        for i in range(20):
            state, m = step_fn(state, batch, jax.random.PRNGKey(0), phase)
            series.append(float(m["total_loss"]))
            if i == 0:
                gnorms[dtype] = float(m["grad_norm"])
        # params must stay f32 (master copy for the optimizer)
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        losses[dtype] = series

    f32, bf16 = np.asarray(losses["float32"]), np.asarray(losses["bfloat16"])
    assert np.isfinite(bf16).all()
    # step-1 forward/backward agree with f32 within bf16 rounding; after
    # that the trajectories diverge chaotically, so only the trend is
    # asserted (bf16 must keep learning)
    np.testing.assert_allclose(bf16[0], f32[0], rtol=0.05)
    np.testing.assert_allclose(gnorms["bfloat16"], gnorms["float32"],
                               rtol=0.15)
    assert np.mean(bf16[-5:]) < np.mean(bf16[:5])

def test_train_step_with_padded_batch_rows(tiny_cfg, rng):
    """Static-shape batch padding (collate pads batch size to a power of
    two with all-zero rows): the step must stay finite. Regression test for
    the guided-attention 0/0 NaN and RQ-EMA pollution found by the
    synthetic-corpus validation harness."""
    from stylesinger_tpu.data import collate_batch

    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    # 3 items -> collate pads the batch to 4 with an all-zero row
    ds_items = []
    for i in range(3):
        t = 24
        tt = 6
        ds_items.append({
            "item_name": f"i{i}",
            "mel": rng.standard_normal((t, cfg["audio_num_mel_bins"])).astype(np.float32) * 0.5 - 2,
            "mel2ph": np.repeat(np.arange(1, tt + 1), 4)[:t],
            "f0": np.abs(rng.standard_normal(t)).astype(np.float32) * 100 + 150,
            "ph_token": rng.integers(1, VOCAB, tt),
            "ep_pitches": rng.integers(40, 80, tt),
            "ep_notedurs": rng.uniform(0.1, 0.6, tt).astype(np.float32),
            "ep_types": np.ones(tt, np.int64),
            "spk_embed": rng.standard_normal(256).astype(np.float32),
            "emo_embed": rng.standard_normal(256).astype(np.float32),
        })
    ds = StyleSingerDataset(cfg, "train", items=ds_items)
    batch = collate_batch([ds[i] for i in range(3)],
                          cfg["frame_buckets"], cfg["token_buckets"])
    assert batch["txt_tokens"].shape[0] == 4  # padded row present
    assert (batch["mel2ph"][3] == 0).all()
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "nsamples"}

    state = init_state(model, cfg, batch)
    step_fn = make_train_step(model, cfg)
    phase = Phase(use_rq=True, forcing=False, use_diff=True)
    for i in range(3):
        state, m = step_fn(state, batch, jax.random.PRNGKey(i), phase)
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, float(v))
    # codebooks must not absorb the all-zero padded rows: no code collapses
    # to (near-)zero norm after EMA updates
    cb = state.codebook["style_extractor"]["rq"]["codebook_0"]["embedding"]
    norms = np.linalg.norm(np.asarray(cb), axis=-1)
    assert (norms > 1e-3).all(), norms.min()


def test_diff_start_lr_guard(capsys):
    """The curriculum guard flags fraction-scaled diff_start that would
    train the eps head at a saturating lr, and stays quiet for the
    reference recipe (diff_start=100k, warmup=8000 -> ~4.2e-4)."""
    from stylesinger_tpu.config import load_config
    from stylesinger_tpu.training.schedules import check_diff_start_lr

    ref = load_config(**dict(decoder="diffsinger", scheduler="rsqrt",
                             lr=2.0, hidden_size=256, warmup_updates=8000,
                             diff_start=100000))
    lr_ref = check_diff_start_lr(ref)
    assert 3e-4 < lr_ref < 5e-4
    assert "WARN" not in capsys.readouterr().out

    hot = load_config(**dict(decoder="diffsinger", scheduler="rsqrt",
                             lr=2.0, hidden_size=256, warmup_updates=1333,
                             diff_start=6000))
    lr_hot = check_diff_start_lr(hot)
    assert lr_hot > 1e-3
    assert "WARN" in capsys.readouterr().out


def test_rss_watchdog_checkpoints_and_raises(tmp_path, tiny_cfg, rng):
    """With an impossibly small max_host_rss_gb the trainer must save a
    checkpoint at the first metrics window and raise HostMemoryExceeded
    (graceful, resume-safe) instead of running to max_updates."""
    from stylesinger_tpu.training.trainer import (
        HostMemoryExceeded, Trainer, host_rss_gb, resolve_rss_limit_gb,
    )

    assert host_rss_gb() > 0.01  # we certainly use >10 MB
    assert resolve_rss_limit_gb(-1.0) == float("inf")
    assert resolve_rss_limit_gb(7.5) == 7.5
    # auto (0.0) arms ONLY on remote-PJRT/tunnel backends; on the CPU
    # test backend it must stay off (r2 advisor: a legitimately
    # high-memory local run must never be interrupted)
    assert resolve_rss_limit_gb(0.0) == float("inf")
    import stylesinger_tpu.training.trainer as trainer_mod
    orig = trainer_mod._is_remote_pjrt_backend
    trainer_mod._is_remote_pjrt_backend = lambda: True
    try:
        auto = resolve_rss_limit_gb(0.0)
        assert 0.1 < auto < 16384  # 85% of MemTotal, sane bounds
    finally:
        trainer_mod._is_remote_pjrt_backend = orig

    cfg = dict(tiny_cfg)
    cfg.update(max_frames=64, max_updates=50, val_check_interval=1000,
               tb_log_interval=1, valid_infer_interval=10 ** 9,
               num_ckpt_keep=1, max_host_rss_gb=0.001)
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=4)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}
    trainer = Trainer(model, cfg, str(tmp_path))
    with pytest.raises(HostMemoryExceeded):
        trainer.fit([batch] * 50, example_batch=batch)
    assert trainer.ckpt.latest_step() == 1  # saved before raising


def test_supervise_restarts_on_exit_75(tmp_path):
    """run.supervise re-runs the command while it exits 75 and returns the
    final status once it exits otherwise."""
    import sys

    from stylesinger_tpu.run import supervise

    counter = tmp_path / "n"
    script = tmp_path / "job.py"
    script.write_text(
        "import pathlib, sys\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()) if p.exists() else 0\n"
        "p.write_text(str(n + 1))\n"
        "sys.exit(75 if n < 2 else 0)\n")
    code = supervise([sys.executable, str(script)])
    assert code == 0
    assert counter.read_text() == "3"  # two restarts + final clean run


def test_multi_resolution_stft_loss_matches_torch():
    """Golden parity vs the reference formulas computed with torch.stft
    (modules/parallel_wavegan/losses/stft_loss.py:12-74 + the multi-res
    average of stft_loss.py:55-100)."""
    import torch

    from stylesinger_tpu.training.losses import multi_resolution_stft_loss

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8192)).astype(np.float32) * 0.3
    y = x + rng.standard_normal((2, 8192)).astype(np.float32) * 0.05

    def torch_mag(sig, fft, hop, win):
        w = torch.hann_window(win)
        st = torch.stft(torch.from_numpy(sig), fft, hop, win, w,
                        return_complex=True)
        mag = torch.sqrt(
            torch.clamp(st.real ** 2 + st.imag ** 2, min=1e-7))
        return mag.transpose(2, 1)

    sc_ref, mag_ref = 0.0, 0.0
    cfgs = [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]
    for fft, hop, win in cfgs:
        xm = torch_mag(x, fft, hop, win)
        ym = torch_mag(y, fft, hop, win)
        sc_ref += (torch.norm(ym - xm, p="fro") /
                   torch.norm(ym, p="fro")).item()
        mag_ref += torch.nn.functional.l1_loss(
            torch.log(ym), torch.log(xm)).item()
    sc_ref /= len(cfgs)
    mag_ref /= len(cfgs)

    sc, mag = multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(sc), sc_ref, rtol=2e-3)
    np.testing.assert_allclose(float(mag), mag_ref, rtol=2e-3)


def test_vocoder_gen_step_with_ms_stft(tiny_cfg):
    """Generator step runs and optimizes with the PWG aux loss enabled."""
    from stylesinger_tpu.training.vocoder_task import (
        init_vocoder_state, make_vocoder_steps,
    )

    cfg = dict(tiny_cfg)
    cfg["lambda_ms_stft"] = 1.0
    hop = int(np.prod(cfg["upsample_rates"]))
    frames = 128  # >= 2048-fft at the multi-res settings needs 8192+ samples
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, frames, cfg["audio_num_mel_bins"])).astype(np.float32)) - 2.0
    f0 = jnp.full((1, frames), 200.0)
    state = init_vocoder_state(cfg, jax.random.PRNGKey(0), mel, f0)
    gen_step, _ = make_vocoder_steps(cfg)
    batch = {
        "mels": mel,
        "f0": f0,
        "wav": jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, frames * hop)).astype(np.float32) * 0.1),
    }
    state2, metrics = gen_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["ms_stft"]))
    assert np.isfinite(float(metrics["gen_loss"]))


def test_warm_start_params_nonstrict(tmp_path, tiny_cfg, rng):
    """Reference `load_ckpt` warm-start semantics (strict=False): matching
    leaves load, unknown keys and shape mismatches are dropped."""
    import jax

    from stylesinger_tpu.training.checkpoint import CheckpointManager
    from stylesinger_tpu.training.step import init_state
    from stylesinger_tpu.training.trainer import (
        Trainer, _nonstrict_merge, warm_start_params,
    )

    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 64
    model = StyleSinger(cfg, VOCAB)
    batch = _synthetic_batch(cfg, rng, n=2)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}
    trainer = Trainer(model, cfg, str(tmp_path / "donor"))
    state = init_state(model, cfg, trainer._numeric(batch), trainer.rng)
    donor = jax.tree.map(lambda x: x + 1.0, state.params)
    mgr = CheckpointManager(str(tmp_path / "donor"), keep=1)
    mgr.save(5, state.replace(params=donor))

    warmed = warm_start_params(state.params, str(tmp_path / "donor"), cfg)
    got = jax.tree.leaves(warmed)
    want = jax.tree.leaves(donor)
    assert all(np.allclose(g, w) for g, w in zip(got, want))

    # non-strict drops: unknown key + shape mismatch keep the target leaf
    tgt = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3)}}
    src = {"a": np.ones((2, 2)), "b": {"c": np.ones(4)}, "zz": np.ones(1)}
    merged, dropped = _nonstrict_merge(tgt, src)
    assert np.allclose(merged["a"], 1.0)
    assert np.allclose(merged["b"]["c"], 0.0)
    assert len(dropped) == 2

    # missing checkpoint dir raises
    with pytest.raises(FileNotFoundError):
        warm_start_params(state.params, str(tmp_path / "nope"), cfg)


def _fixed_shape_batch(cfg, rng, n=8, t=24):
    """Like _synthetic_batch but with a fixed frame/token length so several
    batches share one signature (the scan-dispatch stacking is then exact,
    not just mask-equivalent)."""
    tt = t // 4
    items = []
    for i in range(n):
        items.append({
            "item_name": f"i{i}",
            "mel": rng.standard_normal(
                (t, cfg["audio_num_mel_bins"])).astype(np.float32) * 0.5 - 2,
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
    ds = StyleSingerDataset(cfg, "train", items=items)
    return collate_batch([ds[i] for i in range(n)],
                         cfg["frame_buckets"], cfg["token_buckets"])


def test_scan_dispatch_matches_per_step(tmp_path, tiny_cfg, rng):
    """steps_per_dispatch>1 (on-device lax.scan over a stacked epoch) must
    reproduce the per-step dispatcher exactly: same batch schedule, same
    rng stream (folded in state.step), same curriculum phases — windows
    are clipped at phase boundaries and log/val intervals."""
    from stylesinger_tpu.training.trainer import Trainer

    cfg = dict(tiny_cfg)
    # phase flips inside the run: forcing off at 2, rq on at 4, diff on at 1
    cfg.update(max_frames=64, max_updates=6, val_check_interval=6,
               tb_log_interval=2, valid_infer_interval=10 ** 9,
               num_ckpt_keep=1, forcing=2, rq_start=3, diff_start=0,
               steps_per_dispatch=4, prefetch_batches=0)
    model = StyleSinger(cfg, VOCAB)
    batches = [_fixed_shape_batch(cfg, rng, n=8) for _ in range(3)]
    batches = [{k: v for k, v in b.items() if k != "nsamples"}
               for b in batches]

    trainer = Trainer(model, cfg, str(tmp_path / "scan"))
    state_scan = trainer.fit(batches, example_batch=batches[0])
    assert int(state_scan.step) == 6

    # replay: per-step dispatcher over the scan path's (deterministic)
    # epoch-permutation schedule
    mesh = make_mesh()
    state = init_state(model, cfg, trainer._numeric(batches[0]),
                       jax.random.PRNGKey(cfg["seed"]))
    step_fn = make_train_step(model, cfg)
    rng_j = jax.random.PRNGKey(cfg["seed"])
    for t in range(6):
        epoch, n_b = t // 3, 3
        perm = np.random.default_rng(cfg["seed"] + epoch).permutation(n_b)
        b = trainer._numeric(batches[int(perm[t % n_b])])
        state, _ = step_fn(state, shard_batch(b, mesh), rng_j,
                           phase_for_step(t, cfg))

    # tolerance note: scan-vs-unrolled compilation reorders float reductions
    # and adam amplifies near-zero-grad leaves to ~lr-scale sign flips
    # (measured: median leaf absmax 6e-7, worst 1.4e-4 after 6 steps on one
    # machine, 6.6e-4 on another — codegen differs with host CPU features);
    # a schedule/rng/phase bug diverges at O(1), far beyond these bounds,
    # and the aggregate relative-distance check below is the tight gate
    got = jax.tree_util.tree_leaves(state_scan.params)
    want = jax.tree_util.tree_leaves(state.params)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-3, atol=2e-3)
    num = sum(float(np.sum((np.asarray(g) - np.asarray(w)) ** 2))
              for g, w in zip(got, want))
    den = sum(float(np.sum(np.asarray(w) ** 2)) for w in want)
    assert (num / den) ** 0.5 < 1e-3, (num, den)
    for g, w in zip(jax.tree_util.tree_leaves(state_scan.codebook),
                    jax.tree_util.tree_leaves(state.codebook)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-3, atol=5e-4)


def test_scan_dispatch_budget_fallback(tmp_path, tiny_cfg, rng, capsys):
    """An epoch above device_data_budget_mb must fall back to streaming
    per-step dispatch (and say so) rather than uploading the epoch."""
    from stylesinger_tpu.training.trainer import Trainer

    cfg = dict(tiny_cfg)
    cfg.update(max_frames=64, max_updates=2, val_check_interval=2,
               tb_log_interval=1, valid_infer_interval=10 ** 9,
               num_ckpt_keep=1, steps_per_dispatch=4, prefetch_batches=0,
               device_data_budget_mb=0.0001)
    model = StyleSinger(cfg, VOCAB)
    batch = _fixed_shape_batch(cfg, rng, n=8)
    batch = {k: v for k, v in batch.items() if k != "nsamples"}
    trainer = Trainer(model, cfg, str(tmp_path / "fb"))
    state = trainer.fit([batch], example_batch=batch)
    assert int(state.step) == 2
    assert "streaming per-step" in capsys.readouterr().out


def test_vocoder_scan_matches_per_step(tiny_cfg, rng):
    """The on-device GAN scan (make_vocoder_scan) must reproduce the
    per-step disc+gen dispatchers when cropping is the identity (every
    corpus item exactly crop_frames long, batch = corpus)."""
    from stylesinger_tpu.training.vocoder_task import (
        init_vocoder_state, make_vocoder_bodies, make_vocoder_scan,
        stack_corpus,
    )

    cfg = dict(tiny_cfg)
    cfg.update(hop_size=64, fft_size=256, win_size=256,
               audio_num_mel_bins=16, fmax=8000, audio_sample_rate=16000)
    hop, t = 64, 16
    items = [{
        "mel": rng.standard_normal((t, 16)).astype(np.float32),
        "wav": rng.standard_normal(t * hop).astype(np.float32) * 0.3,
        "f0": np.full(t, 200.0, np.float32),
    }]
    data = stack_corpus(items, cfg, max_frames=t)
    assert data["wav"].shape == (1, t * hop)
    jdata = {k: jnp.asarray(v) for k, v in data.items()}

    mk_state = lambda: init_vocoder_state(  # noqa: E731
        cfg, jax.random.PRNGKey(0), jnp.asarray(data["mels"]),
        jnp.asarray(data["f0"]))
    key = jax.random.PRNGKey(7)

    scan_steps = make_vocoder_scan(cfg)
    st_scan, m = scan_steps(mk_state(), jdata, key, 2, t, 1)
    assert int(st_scan.step) == 2
    assert m["gen_loss"].shape == (2,)

    # replay: identity crop -> the full corpus batch every step
    disc_body, gen_body = make_vocoder_bodies(cfg)
    batch = {"mels": jdata["mels"], "wav": jdata["wav"], "f0": jdata["f0"]}
    st = mk_state()
    for i in range(2):
        k = jax.random.fold_in(key, i)
        st, dm = jax.jit(disc_body)(st, batch, k)
        st, gm = jax.jit(gen_body)(st, batch, k)
        np.testing.assert_allclose(float(m["gen_loss"][i]),
                                   float(gm["gen_loss"]), rtol=1e-4)
    for g, w in zip(jax.tree_util.tree_leaves(st_scan.gen_params),
                    jax.tree_util.tree_leaves(st.gen_params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5)
    for g, w in zip(jax.tree_util.tree_leaves(st_scan.disc_params),
                    jax.tree_util.tree_leaves(st.disc_params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5)


def test_vocoder_scan_random_crops(tiny_cfg, rng):
    """General path: variable-length corpus, on-device random crops, a
    4-step window — finite losses, step advances, crops stay in-bounds
    (would NaN/garbage if the dynamic slice read past an item)."""
    from stylesinger_tpu.training.vocoder_task import (
        init_vocoder_state, make_vocoder_scan, stack_corpus,
    )

    cfg = dict(tiny_cfg)
    cfg.update(hop_size=64, fft_size=256, win_size=256,
               audio_num_mel_bins=16, fmax=8000, audio_sample_rate=16000)
    hop = 64
    items = []
    for t in (40, 24, 33):
        items.append({
            "mel": rng.standard_normal((t, 16)).astype(np.float32),
            "wav": rng.standard_normal(t * hop).astype(np.float32) * 0.3,
            "f0": np.full(t, 200.0, np.float32),
        })
    data = stack_corpus(items, cfg, max_frames=40)
    jdata = {k: jnp.asarray(v) for k, v in data.items()}
    state = init_vocoder_state(cfg, jax.random.PRNGKey(0),
                               jnp.asarray(data["mels"][:, :16]),
                               jnp.asarray(data["f0"][:, :16]))
    scan_steps = make_vocoder_scan(cfg)
    state, m = scan_steps(state, jdata, jax.random.PRNGKey(3), 4, 16, 2)
    assert int(state.step) == 4
    for k, v in m.items():
        assert np.isfinite(np.asarray(v)).all(), (k, v)
