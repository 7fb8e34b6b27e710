"""Loss suite for acoustic-model training.

Behavioral parity targets (AaronZ345/StyleSinger, ``tasks/tts/fs2.py``):
- mel: weighted mix parsed from ``"l1:0.5|ssim:0.5"`` (fs2.py:104-116),
  each masked by nonzero-target frames (``weights_nonzero_speech``);
  SSIM applied on +6-biased spectrograms (fs2.py:168-177).
- duration: MSE on log(dur+1) phone durations (lambda_ph_dur), log-domain
  word/sentence sums (lambda_word_dur / lambda_sent_dur) (fs2.py:180-215).
- pitch (conv f0_gen only): uv BCE + voiced-masked F0 L1/MSE
  (fs2.py:222-241).
- curriculum gating of rq/guided/diffusion losses happens in
  ``compute_losses`` via the static Phase flags
  (``tasks/StyleSinger/stylesinger.py:57-66``).

Everything is a pure function of (outputs, batch) -> scalar dict; masking is
explicit; segment sums use scatter-add instead of Python loops.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# SSIM (single-scale, gaussian window 11, sigma 1.5 — the torch ssim default
# used by the reference's modules/commons/ssim.py)
# ---------------------------------------------------------------------------

def _gaussian_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = _gaussian_1d(size, sigma)
    return np.outer(g, g)


def _blur1d(x: jnp.ndarray, g: np.ndarray, axis: int) -> jnp.ndarray:
    """SAME-padded 1D gaussian blur along ``axis`` as shifted adds."""
    k = len(g)
    half = k // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(x, pad)
    out = None
    for i in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        term = float(g[i]) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def _filter2d(img: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Gaussian-window filter of [B, H, W] images with SAME zero padding.

    The 11x11 window is an outer product of 1D gaussians, so the filter is
    applied separably as shifted multiply-adds. A depthwise 2D conv here
    (the torch formulation) is catastrophic on TPU: with 1 feature channel
    it uses 1/128 of the MXU lanes and measured 4-17 ms per call on v5e —
    ~2/3 of the whole train step. The separable form is exact (same outer
    product, same zero padding) and fuses to a handful of VPU passes.
    """
    g = _gaussian_1d(window_size)
    return _blur1d(_blur1d(img, g, 1), g, 2)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM map of [B, T, M] images (values in [0, ~bias+max])."""
    mu1 = _filter2d(img1, window_size)
    mu2 = _filter2d(img2, window_size)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, window_size) - mu2_sq
    sigma12 = _filter2d(img1 * img2, window_size) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu12 + c1) * (2 * sigma12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


# ---------------------------------------------------------------------------
# mel
# ---------------------------------------------------------------------------

def parse_mel_loss(spec: str) -> Dict[str, float]:
    """``"l1:0.5|ssim:0.5"`` -> {'l1': 0.5, 'ssim': 0.5} (fs2.py:36-46)."""
    out: Dict[str, float] = {}
    for part in spec.split("|"):
        if ":" in part:
            name, lbd = part.split(":")
            out[name] = float(lbd)
        else:
            out[part] = 1.0
    return out


def _nonzero_weights(target: jnp.ndarray) -> jnp.ndarray:
    """[B, T, M] frame mask broadcast over mel bins (fs2.py weights)."""
    mask = (jnp.abs(target).sum(-1) > 0).astype(target.dtype)
    return jnp.broadcast_to(mask[..., None], target.shape)


def mel_losses(mel_out: jnp.ndarray, target: jnp.ndarray,
               loss_spec: str, postfix: str = "") -> Dict[str, jnp.ndarray]:
    w = _nonzero_weights(target)
    denom = jnp.maximum(w.sum(), 1.0)
    out = {}
    for name, lbd in parse_mel_loss(loss_spec).items():
        if name == "l1":
            l = (jnp.abs(mel_out - target) * w).sum() / denom
        elif name == "mse":
            l = (((mel_out - target) ** 2) * w).sum() / denom
        elif name == "ssim":
            s = ssim(mel_out + 6.0, target + 6.0)
            l = ((1.0 - s) * w).sum() / denom
        else:
            raise ValueError(name)
        out[f"{name}{postfix}"] = l * lbd
    return out


# ---------------------------------------------------------------------------
# duration
# ---------------------------------------------------------------------------

def duration_losses(log_dur_pred: jnp.ndarray, mel2ph: jnp.ndarray,
                    txt_tokens: jnp.ndarray, cfg: Any,
                    is_sil: Optional[jnp.ndarray] = None
                    ) -> Dict[str, jnp.ndarray]:
    from stylesinger_tpu.dsp.align import mel2ph_to_dur

    b, t_txt = txt_tokens.shape
    nonpadding = (txt_tokens > 0).astype(jnp.float32)
    dur_gt = mel2ph_to_dur(mel2ph, t_txt).astype(jnp.float32) * nonpadding
    out = {}
    pdur = (log_dur_pred - jnp.log(dur_gt + 1.0)) ** 2
    out["pdur"] = (pdur * nonpadding).sum() / jnp.maximum(
        nonpadding.sum(), 1.0) * cfg["lambda_ph_dur"]

    dur_pred = jnp.maximum(jnp.exp(log_dur_pred) - 1.0, 0.0)
    if cfg["lambda_word_dur"] > 0 and is_sil is not None:
        word_id = (jnp.cumsum(is_sil, -1) * (1 - is_sil)).astype(jnp.int32)
        n_words = t_txt + 1

        def seg_sum(v):
            return jax.vmap(lambda w, x: jnp.zeros(
                (n_words,), v.dtype).at[w].add(x))(word_id, v)[:, 1:]

        wp = seg_sum(dur_pred)
        wg = seg_sum(dur_gt)
        wmask = (wg > 0).astype(jnp.float32)
        wdur = (jnp.log(wp + 1) - jnp.log(wg + 1)) ** 2
        out["wdur"] = (wdur * wmask).sum() / jnp.maximum(wmask.sum(), 1.0) * \
            cfg["lambda_word_dur"]
    if cfg["lambda_sent_dur"] > 0:
        sp = dur_pred.sum(-1)
        sg = dur_gt.sum(-1)
        out["sdur"] = jnp.mean((jnp.log(sp + 1) - jnp.log(sg + 1)) ** 2) * \
            cfg["lambda_sent_dur"]
    return out


# ---------------------------------------------------------------------------
# pitch (conv f0_gen)
# ---------------------------------------------------------------------------

def f0_uv_losses(pitch_pred: jnp.ndarray, f0: jnp.ndarray, uv: jnp.ndarray,
                 nonpadding: jnp.ndarray, cfg: Any,
                 postfix: str = "") -> Dict[str, jnp.ndarray]:
    out = {}
    if cfg["use_uv"] and cfg["pitch_type"] == "frame":
        logits = pitch_pred[:, :, 1]
        bce = jnp.maximum(logits, 0) - logits * uv + \
            jnp.log1p(jnp.exp(-jnp.abs(logits)))
        out[f"uv{postfix}"] = (bce * nonpadding).sum() / jnp.maximum(
            nonpadding.sum(), 1.0) * cfg["lambda_uv"]
        nonpadding = nonpadding * (uv == 0).astype(nonpadding.dtype)
    f0_pred = pitch_pred[:, :, 0]
    if cfg["pitch_loss"] in ("l1", "l2"):
        err = jnp.abs(f0_pred - f0) if cfg["pitch_loss"] == "l1" else \
            (f0_pred - f0) ** 2
        out[f"f0{postfix}"] = (err * nonpadding).sum() / jnp.maximum(
            nonpadding.sum(), 1.0) * cfg["lambda_f0"]
    return out


# ---------------------------------------------------------------------------
# aggregation (mirrors StyleSingerTask.run_model loss dict)
# ---------------------------------------------------------------------------

def compute_losses(ret: Dict, batch: Dict, cfg: Any, *, use_rq: bool,
                   forcing: bool, use_diff: bool) -> Dict[str, jnp.ndarray]:
    """All training losses for one StyleSinger step
    (reference tasks/StyleSinger/stylesinger.py:41-90)."""
    losses: Dict[str, jnp.ndarray] = {}
    target = batch["mels"]
    if cfg["decoder"] == "diffsinger" and use_diff:
        losses["diff"] = ret["diff_loss"]
    if cfg["style"]:
        if not forcing:
            losses["gloss"] = ret["gloss"]
        if use_rq:
            losses["rq_loss"] = ret["rq_loss"]
    losses.update(mel_losses(ret["mel_out"], target, cfg["mel_loss"]))
    losses.update(duration_losses(ret["dur"], batch["mel2ph"],
                                  batch["txt_tokens"], cfg,
                                  is_sil=batch.get("is_sil")))
    if cfg["f0_gen"] == "gmdiff":
        for k in ("gdiff1", "mdiff1", "gdiff2", "mdiff2"):
            losses[k] = ret[k]
    else:
        nonpadding = (batch["mel2ph"] > 0).astype(jnp.float32)
        losses.update(f0_uv_losses(ret["pitch_pred"], batch["f0"],
                                   batch["uv"], nonpadding, cfg))
    return losses


# ---------------------------------------------------------------------------
# Multi-resolution STFT loss (reference modules/parallel_wavegan/
# stft_loss.py:13-100 + losses/stft_loss.py:12-74 — the PWG vocoder's
# auxiliary loss). Pure-JAX: reflect-pad + framed rfft per resolution.
# ---------------------------------------------------------------------------

def _stft_mag_torchlike(x: jnp.ndarray, fft_size: int, hop_size: int,
                        win_length: int) -> jnp.ndarray:
    """|STFT| with torch.stft semantics (center=True, REFLECT padding,
    periodic hann of win_length zero-centered in the fft frame) and the
    reference's 1e-7 magnitude clamp (losses/stft_loss.py:31).

    Framing is inlined (dsp.mel.frame_signal constant-pads; reflect edges
    matter for loss parity at these short windows)."""
    from stylesinger_tpu.dsp.mel import _hann_periodic

    pad = fft_size // 2
    widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, widths, mode="reflect")
    n_frames = 1 + (xp.shape[-1] - fft_size) // hop_size
    idx = (jnp.arange(n_frames)[:, None] * hop_size +
           jnp.arange(fft_size)[None, :])
    frames = xp[..., idx]
    window = jnp.asarray(_hann_periodic(win_length))
    lpad = (fft_size - win_length) // 2
    window = jnp.pad(window, (lpad, fft_size - win_length - lpad))
    mag = jnp.abs(jnp.fft.rfft(frames * window, n=fft_size, axis=-1))
    return jnp.sqrt(jnp.maximum(mag * mag, 1e-7))


def stft_loss(x: jnp.ndarray, y: jnp.ndarray, fft_size: int, hop_size: int,
              win_length: int):
    """(spectral convergence, log-magnitude L1) for wavs x (pred), y (GT)
    of shape [B, T] (stft_loss.py:34-74)."""
    x_mag = _stft_mag_torchlike(x, fft_size, hop_size, win_length)
    y_mag = _stft_mag_torchlike(y, fft_size, hop_size, win_length)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.maximum(
        jnp.linalg.norm(y_mag), 1e-12)
    mag = jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)).mean()
    return sc, mag


def multi_resolution_stft_loss(x: jnp.ndarray, y: jnp.ndarray,
                               fft_sizes=(1024, 2048, 512),
                               hop_sizes=(120, 240, 50),
                               win_lengths=(600, 1200, 240)):
    """Reference MultiResolutionSTFTLoss defaults (stft_loss.py:58-62):
    mean (sc, mag) over the three resolutions."""
    sc_sum, mag_sum = 0.0, 0.0
    for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss(x, y, fs, hs, wl)
        sc_sum += sc
        mag_sum += mag
    n = float(len(fft_sizes))
    return sc_sum / n, mag_sum / n
