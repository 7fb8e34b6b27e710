"""HiFi-GAN NSF vocoder training: adversarial gen/disc steps.

Parity target: the vocoder GAN loop skeleton
(``tasks/vocoder/vocoder_base.py:13-66`` in AaronZ345/StyleSinger) with the
HiFi-GAN losses (LSGAN adversarial + feature matching + mel-reconstruction;
``modules/hifigan/hifigan_nsf.py:181-365``) and the crop-based wav/mel
dataset (``tasks/vocoder/dataset_utils.py``).

TPU design: two jitted steps (generator, discriminator) sharing one
``VocoderState``; batches are fixed-size random crops so every step
compiles once; both steps shard over the ``data`` mesh axis like the
acoustic trainer.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from stylesinger_tpu.models.hifigan import (
    HifiGanGenerator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
    discriminator_loss, feature_matching_loss, generator_adv_loss,
)


class VocoderState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    gen_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_vocoder_models(cfg: Any):
    gen = HifiGanGenerator(cfg)
    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    return gen, mpd, msd


def init_vocoder_state(cfg: Any, rng: jax.Array,
                       example_mel: jnp.ndarray,
                       example_f0: jnp.ndarray) -> VocoderState:
    gen, mpd, msd = make_vocoder_models(cfg)
    k1, k2, k3, kn = jax.random.split(rng, 4)
    gen_vars = gen.init({"params": k1, "noise": kn}, example_mel, example_f0)
    wav_probe = jnp.zeros(
        (example_mel.shape[0],
         example_mel.shape[1] * int(np.prod(cfg["upsample_rates"]))))
    disc_params = {
        "mpd": mpd.init(k2, wav_probe)["params"],
        "msd": msd.init(k3, wav_probe)["params"],
    }
    lr = cfg.get("vocoder_lr", 2e-4)
    b1 = cfg.get("vocoder_adam_b1", 0.8)
    b2 = cfg.get("vocoder_adam_b2", 0.99)
    # 'radam' mirrors the reference PWG recipe's optimizer
    # (modules/parallel_wavegan/optimizers/radam.py)
    opt = {"adamw": optax.adamw, "radam": optax.radam}[
        cfg.get("vocoder_optimizer", "adamw")]
    gen_tx = opt(lr, b1=b1, b2=b2)
    disc_tx = opt(lr, b1=b1, b2=b2)
    return VocoderState(
        step=jnp.zeros((), jnp.int32), gen_params=gen_vars["params"],
        disc_params=disc_params, gen_opt=gen_tx.init(gen_vars["params"]),
        disc_opt=disc_tx.init(disc_params), gen_tx=gen_tx, disc_tx=disc_tx)


def make_vocoder_bodies(cfg: Any):
    """Un-jitted (disc_body, gen_body) shared by the per-step dispatchers
    (make_vocoder_steps) and the on-device multi-step GAN scan
    (make_vocoder_scan)."""
    gen, mpd, msd = make_vocoder_models(cfg)
    lambda_fm = cfg.get("lambda_fm", 2.0)
    lambda_mel = cfg.get("lambda_mel", 45.0)
    # PWG-style auxiliary multi-resolution STFT loss (reference
    # modules/parallel_wavegan/stft_loss.py); off by default to match the
    # reference HiFi-GAN recipe, on for PWG-style training
    lambda_ms_stft = cfg.get("lambda_ms_stft", 0.0)
    sr = cfg["audio_sample_rate"]

    def gen_wav(gen_params, mel, f0, rng):
        return gen.apply({"params": gen_params}, mel, f0,
                         rngs={"noise": rng})

    def mel_of(wav):
        # the differentiable XLA twin (the Pallas kernel has no VJP; it
        # serves the inference/data-prep paths)
        from stylesinger_tpu.dsp.mel import wav2mel
        return wav2mel(wav, sample_rate=sr, n_fft=cfg["fft_size"],
                       hop_size=cfg["hop_size"], win_length=cfg["win_size"],
                       n_mels=cfg["audio_num_mel_bins"], fmin=cfg["fmin"],
                       fmax=cfg["fmax"])

    def disc_step(state: VocoderState, batch: Dict, rng: jax.Array
                  ) -> Tuple[VocoderState, Dict]:
        fake = jax.lax.stop_gradient(
            gen_wav(state.gen_params, batch["mels"], batch["f0"], rng))
        real = batch["wav"]

        def loss_fn(dp):
            rp, _ = mpd.apply({"params": dp["mpd"]}, real)
            fp, _ = mpd.apply({"params": dp["mpd"]}, fake)
            rs, _ = msd.apply({"params": dp["msd"]}, real)
            fs, _ = msd.apply({"params": dp["msd"]}, fake)
            return discriminator_loss(rp, fp) + discriminator_loss(rs, fs)

        loss, grads = jax.value_and_grad(loss_fn)(state.disc_params)
        updates, opt = state.disc_tx.update(grads, state.disc_opt,
                                            state.disc_params)
        dp = optax.apply_updates(state.disc_params, updates)
        return state.replace(disc_params=dp, disc_opt=opt), \
            {"disc_loss": loss}

    def gen_step(state: VocoderState, batch: Dict, rng: jax.Array
                 ) -> Tuple[VocoderState, Dict]:
        real = batch["wav"]
        real_mel = batch["mels"]

        def loss_fn(gp):
            fake = gen_wav(gp, real_mel, batch["f0"], rng)
            rp, rfp = mpd.apply({"params": state.disc_params["mpd"]}, real)
            fp, ffp = mpd.apply({"params": state.disc_params["mpd"]}, fake)
            rs, rfs = msd.apply({"params": state.disc_params["msd"]}, real)
            fs, ffs = msd.apply({"params": state.disc_params["msd"]}, fake)
            adv = generator_adv_loss(fp) + generator_adv_loss(fs)
            fm = feature_matching_loss(rfp, ffp) + \
                feature_matching_loss(rfs, ffs)
            mel_l1 = jnp.abs(mel_of(fake) - mel_of(real)).mean()
            total = adv + lambda_fm * fm + lambda_mel * mel_l1
            parts = {"adv": adv, "fm": fm, "mel_l1": mel_l1}
            if lambda_ms_stft > 0:
                from stylesinger_tpu.training.losses import (
                    multi_resolution_stft_loss,
                )
                sc, mag = multi_resolution_stft_loss(fake, real)
                parts["ms_stft"] = sc + mag
                total = total + lambda_ms_stft * (sc + mag)
            return total, parts

        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.gen_params)
        updates, opt = state.gen_tx.update(grads, state.gen_opt,
                                           state.gen_params)
        gp = optax.apply_updates(state.gen_params, updates)
        metrics = dict(parts)
        metrics["gen_loss"] = total
        return state.replace(step=state.step + 1, gen_params=gp,
                             gen_opt=opt), metrics

    return disc_step, gen_step


def make_vocoder_steps(cfg: Any):
    disc_body, gen_body = make_vocoder_bodies(cfg)
    return jax.jit(gen_body), jax.jit(disc_body)


def stack_corpus(items, cfg: Any, max_frames: int) -> Dict[str, np.ndarray]:
    """Pad a whole (small) corpus to one [N, T(, ...)] signature for the
    device-resident GAN scan: mel/f0 to ``max_frames`` frames, wav to
    ``max_frames * hop`` samples, plus per-item frame counts."""
    hop = cfg["hop_size"]
    n_mels = cfg["audio_num_mel_bins"]
    mels = np.zeros((len(items), max_frames, n_mels), np.float32)
    wavs = np.zeros((len(items), max_frames * hop), np.float32)
    f0s = np.zeros((len(items), max_frames), np.float32)
    lens = np.zeros((len(items),), np.int32)
    for i, it in enumerate(items):
        t = min(int(it["mel"].shape[0]), max_frames)
        mels[i, :t] = it["mel"][:t]
        f0s[i, :t] = it["f0"][:t]
        w = np.asarray(it["wav"])[: t * hop]
        wavs[i, : len(w)] = w
        lens[i] = t
    return {"mels": mels, "wav": wavs, "f0": f0s, "lens": lens}


def make_vocoder_scan(cfg: Any):
    """Multi-step GAN dispatch: W (disc + gen) optimizer iterations in ONE
    device program, with ON-DEVICE random cropping from a device-resident
    corpus (``stack_corpus``).

    The reference's vocoder loop (tasks/vocoder/vocoder_base.py:13-66)
    crops on the host and dispatches twice per iteration; through a
    remote-PJRT tunnel that pays upload + dispatch latency 2W times per W
    steps. Here the whole corpus lives in HBM and the crop is a batched
    dynamic-slice inside the scan body, so a window costs one dispatch.

    Returns ``scan_steps(state, data, rng, n_steps, crop_frames,
    batch_size) -> (state, metrics[W])``. Randomness folds ``state.step``
    so the stream continues identically across windows and resumes."""
    disc_body, gen_body = make_vocoder_bodies(cfg)
    hop = cfg["hop_size"]

    @functools.partial(jax.jit,
                       static_argnames=("n_steps", "crop_frames",
                                        "batch_size"),
                       donate_argnames=("state",))
    def scan_steps(state: VocoderState, data: Dict, rng: jax.Array,
                   n_steps: int, crop_frames: int, batch_size: int
                   ) -> Tuple[VocoderState, Dict]:
        n_items = data["lens"].shape[0]
        n_mel_bins = data["mels"].shape[-1]

        def crop(k):
            ki, ko = jax.random.split(k)
            idx = jax.random.randint(ki, (batch_size,), 0, n_items)
            # offset uniform in [0, len - crop_frames) like the host
            # crop_batch (traced bound -> draw wide and mod the span)
            span = jnp.maximum(jnp.take(data["lens"], idx) - crop_frames, 1)
            off = jax.random.randint(ko, (batch_size,), 0, 1 << 30) % span

            def one(j, o):
                mel = jax.lax.dynamic_slice(
                    data["mels"][j], (o, 0), (crop_frames, n_mel_bins))
                f0 = jax.lax.dynamic_slice(data["f0"][j], (o,),
                                           (crop_frames,))
                wav = jax.lax.dynamic_slice(data["wav"][j], (o * hop,),
                                            (crop_frames * hop,))
                return mel, wav, f0

            mel, wav, f0 = jax.vmap(one)(idx, off)
            return {"mels": mel, "wav": wav, "f0": f0}

        def body(st, _):
            k = jax.random.fold_in(rng, st.step)
            batch = crop(jax.random.fold_in(k, 1))
            st, dm = disc_body(st, batch, k)
            st, gm = gen_body(st, batch, k)
            return st, {**dm, **gm}

        return jax.lax.scan(body, state, None, length=n_steps)

    return scan_steps


def crop_batch(items, cfg: Any, rng: np.random.Generator,
               crop_frames: int = 32) -> Dict[str, np.ndarray]:
    """Random fixed-size mel/wav crops (tasks/vocoder/dataset_utils.py)."""
    hop = cfg["hop_size"]
    mels, wavs, f0s = [], [], []
    for it in items:
        t = it["mel"].shape[0]
        s = int(rng.integers(0, max(t - crop_frames, 1)))
        e = s + crop_frames
        mel = it["mel"][s:e]
        if mel.shape[0] < crop_frames:
            mel = np.pad(mel, ((0, crop_frames - mel.shape[0]), (0, 0)))
        wav = it["wav"][s * hop: e * hop]
        if len(wav) < crop_frames * hop:
            wav = np.pad(wav, (0, crop_frames * hop - len(wav)))
        f0 = it["f0"][s:e]
        if len(f0) < crop_frames:
            f0 = np.pad(f0, (0, crop_frames - len(f0)))
        mels.append(mel)
        wavs.append(wav)
        f0s.append(f0)
    return {"mels": np.stack(mels).astype(np.float32),
            "wav": np.stack(wavs).astype(np.float32),
            "f0": np.stack(f0s).astype(np.float32)}
