"""Head-to-head quality: reference torch StyleSinger vs this framework,
SAME data, SAME budget, SAME metrics (VERDICT r4 "matching-or-beating is
asserted, never measured").

``--impl ref`` trains the *actual* reference model
(``/root/reference/modules/StyleSinger/stylesinger.py``) on our binarized
synthetic corpus with the reference recipe — losses assembled exactly as
``tasks/StyleSinger/stylesinger.py::run_model`` + ``tasks/tts/fs2.py``
(mel l1:0.5|ssim:0.5, pdur/wdur/sdur, gmdiff dual-chain pitch, gloss /
rq_loss / diff curriculum), AdamW(lr, (beta1,beta2), wd) with the RSQRT
schedule and clip_grad_norm=1 (``tasks/tts/tts_base.py:150-156``,
``utils/training_utils.py:4-27``) — then evaluates the zero-shot split
with the IDENTICAL metric code (tools/validate_training.py::evaluate
semantics: teacher-forced MCD/FFE + free-running duration MAE).

``--impl tpu`` runs tools/validate_training.py with the same matched
config. ``--combine`` writes results/ref_vs_tpu_quality.json.

Matched-reduced config (both impls, CPU-feasible for torch):
hidden 128, 2+2 FFT layers, mel denoiser 10x128, F0 denoisers 6x96,
full 100-step diffusion chains, 6000 steps at the reference curriculum
fractions with warmup_updates kept at the reference's absolute 8000 so
lr(diff_start) stays under the ~5e-4 bootstrap bound measured by
tools/ab_diffusion_bootstrap.py (identical schedule for both impls).

Usage:
  python tools/ref_headtohead.py --impl ref   [--dir data/r5full]
  python tools/ref_headtohead.py --impl tpu   [--dir data/r5full]
  python tools/ref_headtohead.py --combine
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

STEPS = 6000
BATCH = 4
# identical hyperparameters for both implementations
MATCHED = dict(
    hidden_size=128, enc_layers=2, dec_layers=2, num_heads=2,
    enc_ffn_kernel_size=9, dec_ffn_kernel_size=9,
    predictor_hidden=128,
    residual_layers=10, residual_channels=128,
    f0_residual_layers=6, f0_residual_channels=96,
    timesteps=100, K_step=100, f0_timesteps=100, f0_K_step=100,
    nRQ=64, rq_depth=4,
    style_wn_layers=4, style_conv_dilations=(1, 1, 1, 1),
    aligner_layers=2, aligner_ffn_dim=512,
    # one static bucket covering the longest corpus item (827 frames) —
    # identical padded shapes for both impls, ~35% cheaper than 1024
    frame_buckets=(832,), max_frames=832,
    max_sentences=BATCH, max_updates=STEPS,
    # reference curriculum fractions of 320k, scaled to 6000; warmup kept
    # at the reference's ABSOLUTE 8000 so lr(diff_start=1800) ~ 4.4e-4
    # stays under the eps-head's ~5e-4 saturation bound at hidden 128
    forcing=480, rq_start=600, diff_start=1800, warmup_updates=8000,
    val_check_interval=1500, milestone_interval=0, num_ckpt_keep=2,
    # jax-side dispatch width only (torch side trains a plain step loop;
    # the dispatchers are equivalence-gated in tests)
    steps_per_dispatch=25,
)


def build_matched_cfg(run_dir: str, work_name: str):
    from tools.validate_training import build_cfg

    ov = ",".join(f"{k}={v}" for k, v in MATCHED.items()
                  if not isinstance(v, tuple))
    cfg = build_cfg(os.path.join(run_dir, "raw"),
                    os.path.join(run_dir, "binary"),
                    os.path.join(run_dir, work_name), STEPS, overrides=ov)
    for k, v in MATCHED.items():
        if isinstance(v, tuple):
            cfg[k] = v
    return cfg


# ---------------------------------------------------------------- torch
def ref_hparams_from_cfg(cfg):
    """Populate the reference's global hparams from the matched config.
    Key names match because stylesinger_tpu.config mirrors the reference
    yaml cascade; structural extras follow tests/ref_compat.TINY_HPARAMS."""
    from ref_compat import TINY_HPARAMS, setup_reference

    hp = setup_reference()
    hp.clear()
    hp.update(TINY_HPARAMS)
    for k in list(TINY_HPARAMS) + [
            "audio_num_mel_bins", "keep_bins", "hidden_size", "enc_layers",
            "dec_layers", "num_heads", "enc_ffn_kernel_size",
            "dec_ffn_kernel_size", "predictor_hidden", "residual_layers",
            "residual_channels", "f0_residual_layers",
            "f0_residual_channels", "timesteps", "K_step", "f0_timesteps",
            "f0_K_step", "nRQ", "rq_depth", "forcing", "rq_start",
            "diff_start", "warmup_updates", "pitch_norm", "f0_mean",
            "f0_std", "lambda_f0", "lambda_uv", "lambda_ph_dur",
            "lambda_word_dur", "lambda_sent_dur", "dur_loss",
            "max_beta", "f0_max_beta", "schedule_type", "diff_loss_type",
            "dilation_cycle_length", "f0_dilation_cycle_length",
            "mel_vmin", "mel_vmax", "dropout", "predictor_dropout"]:
        if k in cfg:
            hp[k] = cfg[k]
    hp.update(
        emo_size=256, spec_min=list(cfg["spec_min"]),
        spec_max=list(cfg["spec_max"]),
        lr=float(cfg.get("lr", 2.0)),
        optimizer_adam_beta1=cfg.get("optimizer_adam_beta1", 0.9),
        optimizer_adam_beta2=cfg.get("optimizer_adam_beta2", 0.98),
        weight_decay=cfg.get("weight_decay", 0.0),
        clip_grad_norm=cfg.get("clip_grad_norm", 1.0),
        mel_loss="l1:0.5|ssim:0.5",
    )
    return hp


def torch_batches(cfg, ds, batch_size, seed):
    """Endless epoch-shuffled minibatches collated with OUR collate (same
    padded static-bucket shapes both impls train on)."""
    from stylesinger_tpu.data import collate_batch

    rng = np.random.default_rng(seed)
    n = len(ds)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            items = [ds[int(j)] for j in order[i:i + batch_size]]
            b = collate_batch(items, cfg["frame_buckets"],
                              cfg["token_buckets"])
            b.pop("nsamples", None)
            yield b


def run_ref(run_dir: str):
    # pin jax (pulled in by dataset/metrics helpers) to the host CPU: the
    # axon sitecustomize would otherwise init the single-client TPU tunnel
    # and contend with the training chain
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch
    import torch.nn.functional as F

    torch.set_num_threads(max(1, (os.cpu_count() or 1)))
    cfg = build_matched_cfg(run_dir, "work_ref_hh")
    work_dir = cfg["work_dir"]
    os.makedirs(work_dir, exist_ok=True)
    hp = ref_hparams_from_cfg(cfg)

    from stylesinger_tpu.data import StyleSingerDataset
    from stylesinger_tpu.text import build_token_encoder

    encoder = build_token_encoder(
        os.path.join(run_dir, "binary", "phone_set.json"))
    vocab = len(encoder)
    train_ds = StyleSingerDataset(cfg, "train")
    valid_ds = StyleSingerDataset(cfg, "valid")
    sil_ids = [t for t in encoder.encode("SP") if t > 3]  # skip OOV hits

    from modules.StyleSinger.stylesinger import StyleSinger as RefSS
    from modules.commons.ssim import ssim as ref_ssim
    from modules.fastspeech.tts_modules import mel2ph_to_dur

    class Dict:
        def pad(self):
            return 0

        def __len__(self):
            return vocab

    torch.manual_seed(0)
    model = RefSS(Dict())
    n_params = sum(p.numel() for p in model.parameters())
    print(f"| reference StyleSinger: {n_params / 1e6:.1f} M params, "
          f"vocab {vocab}, train {len(train_ds)}")

    opt = torch.optim.AdamW(model.parameters(), lr=hp["lr"],
                            betas=(hp["optimizer_adam_beta1"],
                                   hp["optimizer_adam_beta2"]),
                            weight_decay=hp["weight_decay"])

    def sched_lr(step):  # utils/training_utils.py::RSQRTSchedule.step
        warmup = min(step / hp["warmup_updates"], 1.0)
        rd = max(hp["warmup_updates"], step) ** -0.5
        return max(hp["lr"] * warmup * rd * hp["hidden_size"] ** -0.5, 1e-7)

    def weights_nonzero(target):  # fs2.py::weights_nonzero_speech
        return target.abs().sum(-1, keepdim=True).ne(0).float().expand_as(
            target)

    def mel_losses(mel_out, target, losses):  # fs2.py::add_mel_loss
        w = weights_nonzero(target)
        l1 = (F.l1_loss(mel_out, target, reduction="none") * w).sum() \
            / w.sum()
        losses["l1"] = l1 * 0.5
        losses["ssim"] = ssim_loss(mel_out, target, w) * 0.5

    def ssim_loss(mel_out, target, w):  # fs2.py::ssim_loss
        s = 1 - ref_ssim(((mel_out + 6) / 7).unsqueeze(1),
                         ((target + 6) / 7).unsqueeze(1))
        return s

    def dur_losses(dur_pred, mel2ph, txt_tokens, losses):
        # fs2.py::add_dur_loss (sil ids from the corpus phone set)
        B, T = txt_tokens.shape
        nonpadding = (txt_tokens != 0).float()
        dur_gt = mel2ph_to_dur(mel2ph, T).float() * nonpadding
        is_sil = torch.zeros_like(txt_tokens).bool()
        for sid in sil_ids:
            is_sil = is_sil | (txt_tokens == sid)
        is_sil = is_sil.float()
        pdur = F.mse_loss(dur_pred, (dur_gt + 1).log(), reduction="none")
        losses["pdur"] = (pdur * nonpadding).sum() / nonpadding.sum() \
            * hp.get("lambda_ph_dur", 1.0)
        dp = (dur_pred.exp() - 1).clamp(min=0)
        if hp.get("lambda_word_dur", 1.0) > 0:
            word_id = (is_sil.cumsum(-1) * (1 - is_sil)).long()
            wp = dp.new_zeros([B, int(word_id.max()) + 1]).scatter_add(
                1, word_id, dp)[:, 1:]
            wg = dur_gt.new_zeros([B, int(word_id.max()) + 1]).scatter_add(
                1, word_id, dur_gt)[:, 1:]
            wl = F.mse_loss((wp + 1).log(), (wg + 1).log(),
                            reduction="none")
            wnp = (wg > 0).float()
            losses["wdur"] = (wl * wnp).sum() / max(wnp.sum(), 1) \
                * hp.get("lambda_word_dur", 1.0)
        if hp.get("lambda_sent_dur", 1.0) > 0:
            sl = F.mse_loss((dp.sum(-1) + 1).log(),
                            (dur_gt.sum(-1) + 1).log(), reduction="mean")
            losses["sdur"] = sl.mean() * hp.get("lambda_sent_dur", 1.0)

    def to_t(x):
        x = np.asarray(x)
        if x.dtype in (np.int32, np.int64):
            return torch.from_numpy(x.astype(np.int64))
        return torch.from_numpy(x.astype(np.float32))

    batches = torch_batches(cfg, train_ds, BATCH, seed=0)
    t0 = time.time()
    log_every = 100
    model.train()
    for step in range(1, STEPS + 1):
        b = next(batches)
        txt = to_t(b["txt_tokens"])
        mels = to_t(b["mels"])
        mel2ph = to_t(b["mel2ph"])
        f0, uv = to_t(b["f0"]), to_t(b["uv"])
        out = model(
            txt, mel2ph=mel2ph, spk_embed=to_t(b["spk_embed"]),
            emo_embed=to_t(b["emo_embed"]), ref_mels=mels, ref_f0=f0,
            f0=f0, uv=uv, tgt_mels=mels, global_steps=step, infer=False,
            note=to_t(b["notes"]), note_dur=to_t(b["note_durs"]),
            note_type=to_t(b["note_types"]))
        losses = {}
        # tasks/StyleSinger/stylesinger.py::run_model loss assembly
        if step > hp["diff_start"]:
            losses["diff"] = out["diff"]
        if step > hp["forcing"]:
            losses["gloss"] = out["gloss"]
        if step > hp["rq_start"]:
            losses["rq_loss"] = out["rq_loss"]
        mel_losses(out["mel_out"], mels, losses)
        dur_losses(out["dur"], mel2ph, txt, losses)
        for k in ("gdiff1", "mdiff1", "gdiff2", "mdiff2"):
            losses[k] = out[k]
        total = sum(v for v in losses.values() if isinstance(v,
                                                             torch.Tensor))
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(),
                                       hp["clip_grad_norm"])
        for g in opt.param_groups:
            g["lr"] = sched_lr(step)
        opt.step()
        if step % log_every == 0 or step == 1:
            sps = (step if step == 1 else log_every) / max(
                time.time() - t0, 1e-9)
            t0 = time.time()
            msg = {k: round(float(v), 4) for k, v in losses.items()}
            print(f"| ref step {step}: total {float(total):.4f} {msg} "
                  f"({sps:.2f} steps/s)", flush=True)
            if not np.isfinite(float(total)):
                raise FloatingPointError(f"non-finite loss at {step}")
        if step % 1000 == 0 or step == STEPS:
            torch.save({"state_dict": model.state_dict(), "step": step},
                       os.path.join(work_dir, "ref_model.pt"))

    metrics = eval_ref(cfg, hp, model, valid_ds,
                       n_items=1 if STEPS <= 3 else 12)
    metrics["steps"] = STEPS
    metrics["impl"] = "reference_torch"
    metrics["n_params_m"] = round(n_params / 1e6, 2)
    print(json.dumps({"metric": "ref_headtohead", **metrics}))
    with open(os.path.join(work_dir, "validation.json"), "w") as f:
        json.dump(metrics, f, indent=1)


def eval_ref(cfg, hp, model, valid_ds, n_items: int = 12):
    """Mirror of tools/validate_training.py::evaluate on the torch model:
    teacher-forced sampling -> MCD/FFE; free-running -> duration MAE."""
    import torch

    from modules.fastspeech.tts_modules import mel2ph_to_dur

    from stylesinger_tpu.data import collate_batch
    from stylesinger_tpu.dsp.pitch import denorm_f0
    from stylesinger_tpu.eval.metrics import ffe, mcd
    import jax.numpy as jnp

    def to_t(x):
        x = np.asarray(x)
        if x.dtype in (np.int32, np.int64):
            return torch.from_numpy(x.astype(np.int64))
        return torch.from_numpy(x.astype(np.float32))

    model.eval()
    mcds, ffes, durs = [], [], []
    with torch.no_grad():
        for i in range(min(n_items, len(valid_ds))):
            item = valid_ds[i]
            b = collate_batch([item], cfg["frame_buckets"],
                              cfg["token_buckets"])
            b.pop("nsamples", None)
            torch.manual_seed(1234 + i)
            out = model(
                to_t(b["txt_tokens"]), mel2ph=to_t(b["mel2ph"]),
                spk_embed=to_t(b["spk_embed"]),
                emo_embed=to_t(b["emo_embed"]), ref_mels=to_t(b["mels"]),
                ref_f0=to_t(b["f0"]), f0=None, uv=None, infer=True,
                global_steps=STEPS, note=to_t(b["notes"]),
                note_dur=to_t(b["note_durs"]),
                note_type=to_t(b["note_types"]))
            T = int(np.sum(np.asarray(item["mel2ph"]) > 0))
            mel_gt = np.asarray(item["mels"])[:T]
            mel_pred = out["mel_out"][0, :T].numpy()
            f0_gt_hz = np.asarray(denorm_f0(
                jnp.asarray(np.asarray(item["f0"])[:T]),
                jnp.asarray(np.asarray(item["uv"])[:T]),
                pitch_norm=cfg["pitch_norm"], f0_mean=cfg["f0_mean"],
                f0_std=cfg["f0_std"]))
            f0_pred_hz = out["f0_denorm"][0, :T].numpy()
            mcds.append(mcd(mel_gt, mel_pred))
            ffes.append(ffe(f0_gt_hz, f0_pred_hz))

            torch.manual_seed(5678 + i)
            out_free = model(
                to_t(b["txt_tokens"]), mel2ph=None,
                spk_embed=to_t(b["spk_embed"]),
                emo_embed=to_t(b["emo_embed"]), ref_mels=to_t(b["mels"]),
                ref_f0=to_t(b["f0"]), f0=None, uv=None, infer=True,
                global_steps=STEPS, note=to_t(b["notes"]),
                note_dur=to_t(b["note_durs"]),
                note_type=to_t(b["note_types"]))
            m2p = np.asarray(item["mel2ph"])
            n_ph = int(np.asarray(item["txt_tokens"]).shape[0])
            dur_gt = np.bincount(m2p[m2p > 0] - 1,
                                 minlength=n_ph)[:n_ph]
            dur_pred = mel2ph_to_dur(out_free["mel2ph"],
                                     to_t(b["txt_tokens"]).shape[1]
                                     )[0].numpy()
            durs.append(float(np.abs(dur_pred[:n_ph] - dur_gt).mean()))
            print(f"| ref eval item {i}: mcd {mcds[-1]:.2f} "
                  f"ffe {ffes[-1]:.4f} dur {durs[-1]:.2f}", flush=True)
    return {"mcd": float(np.mean(mcds)), "ffe": float(np.mean(ffes)),
            "dur_mae_frames": float(np.mean(durs)), "n_items": len(mcds)}


# ------------------------------------------------------------------ jax
def run_tpu(run_dir: str, seed: int = 0, cpu: bool = False):
    """Same matched config through the standard training/eval path
    (inline equivalent of tools/validate_training.py's main — subprocess
    --overrides can't carry the tuple-valued bucket keys).

    seed != 0 runs a supplementary variance probe (own work dir, same
    protocol); --cpu lets the probe run off-chip while the TPU is busy."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    wname = "work_tpu_hh" if seed == 0 else f"work_tpu_hh_s{seed}"
    cfg = build_matched_cfg(run_dir, wname)
    cfg["seed"] = seed
    work_dir = cfg["work_dir"]

    from tools.validate_training import evaluate

    from stylesinger_tpu.data import (
        BucketBatcher, EpochBatches, StyleSingerDataset,
    )
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.trainer import Trainer

    encoder = build_token_encoder(
        os.path.join(run_dir, "binary", "phone_set.json"))
    model = StyleSinger(cfg, len(encoder))
    train_ds = StyleSingerDataset(cfg, "train")
    valid_ds = StyleSingerDataset(cfg, "valid")
    trainer = Trainer(model, cfg, work_dir)

    def valid_batches():
        bb = BucketBatcher(valid_ds, cfg, shuffle=False,
                           max_tokens=cfg["max_valid_tokens"],
                           max_sentences=cfg["max_valid_sentences"])
        return bb.batches(0)

    t0 = time.time()
    state = trainer.fit(EpochBatches(train_ds, cfg), valid_batches)
    print(f"| trained {STEPS} steps in {time.time() - t0:.0f}s")
    metrics = evaluate(cfg, model, state, valid_ds)
    metrics["steps"] = STEPS
    metrics["impl"] = "stylesinger_tpu"
    metrics["seed"] = seed
    metrics["backend"] = jax.default_backend()
    print(json.dumps({"metric": "tpu_headtohead", **metrics}))
    with open(os.path.join(work_dir, "validation.json"), "w") as f:
        json.dump(metrics, f, indent=1)


def combine(run_dir: str):
    rows = {}
    for impl, wd in (("reference_torch", "work_ref_hh"),
                     ("stylesinger_tpu", "work_tpu_hh")):
        p = os.path.join(run_dir, wd, "validation.json")
        if os.path.exists(p):
            rows[impl] = json.load(open(p))
    out = {
        "metric": "ref_vs_tpu_quality",
        "protocol": {
            "data": f"{run_dir}/binary (identical shards, identical "
                    "zero-shot split)",
            "steps": STEPS, "batch": BATCH,
            "matched_config": {k: (list(v) if isinstance(v, tuple) else v)
                               for k, v in MATCHED.items()},
            "metrics": "tools/validate_training.py::evaluate semantics "
                       "(teacher-forced MCD/FFE, free-running dur MAE)",
        },
        "results": rows,
    }
    if len(rows) == 2:
        ours, ref = rows["stylesinger_tpu"], rows["reference_torch"]
        out["ours_beats_or_matches"] = {
            "ffe": ours["ffe"] <= ref["ffe"] + 1e-6,
            "mcd": ours["mcd"] <= ref["mcd"] * 1.01,
            "dur_mae_frames":
                ours["dur_mae_frames"] <= ref["dur_mae_frames"] * 1.05,
        }
    dst = os.path.join(REPO, "results", "ref_vs_tpu_quality.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["ref", "tpu"])
    ap.add_argument("--combine", action="store_true")
    ap.add_argument("--dir", default="data/r5full")
    ap.add_argument("--smoke", action="store_true",
                    help="3-step harness smoke test")
    ap.add_argument("--seed", type=int, default=0,
                    help="tpu impl only: supplementary variance-probe "
                    "seed (own work dir)")
    ap.add_argument("--cpu", action="store_true",
                    help="tpu impl only: run on the host CPU backend")
    args = ap.parse_args()

    if args.smoke:
        global STEPS
        STEPS = 3
    if args.combine:
        combine(args.dir)
    elif args.impl == "ref":
        run_ref(args.dir)
    elif args.impl == "tpu":
        run_tpu(args.dir, seed=args.seed, cpu=args.cpu)
    else:
        raise SystemExit("need --impl ref|tpu or --combine")


if __name__ == "__main__":
    main()
