"""FastSpeech2 acoustic backbone (flax, batch-first, static-shape).

Behavioral parity target: ``FastSpeech2``
(``modules/fastspeech/fs2.py:21-262`` in AaronZ345/StyleSinger): phone
embedding + FFT encoder; duration predictor + length regulator -> ``mel2ph``;
pitch (frame/ph/cwt variants) and optional energy embeddings; FFT decoder +
linear mel projection.

TPU-native design decisions:
- ``mel2ph`` always has a *static* target length (``max_frames``); at
  inference the length regulator fills the static buffer and the
  ``tgt_nonpadding`` mask carries the true length.
- ``predictor_grad`` gradient scaling is a ``stop_gradient`` mix (the
  reference uses ``x.detach() + g*(x-x.detach())``, fs2.py:166).
- train/infer is a static Python bool: two compiled graphs, no traced
  branching.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stylesinger_tpu.dsp.align import expand_states
from stylesinger_tpu.dsp.pitch import denorm_f0, f0_to_coarse
from stylesinger_tpu.models.common import (
    DurationPredictor, Embedding, FastspeechDecoder, FastspeechEncoder,
    PitchPredictor, length_regulator,
)


def grad_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Value-preserving gradient scaling (reference fs2.py:166)."""
    if scale == 1.0:
        return x
    return jax.lax.stop_gradient(x) + scale * (x - jax.lax.stop_gradient(x))


class FastSpeech2(nn.Module):
    """Standalone FS2 model; StyleSinger composes the same submodules."""
    cfg: Any
    vocab_size: int
    out_dims: int = 80

    def setup(self):
        c = self.cfg
        h = c["hidden_size"]
        self.encoder = FastspeechEncoder(
            self.vocab_size, h, c["enc_layers"], c["enc_ffn_kernel_size"],
            num_heads=c["num_heads"], dropout=c["dropout"],
            rel_pos=bool(c.get("rel_pos", False)))
        self.decoder = FastspeechDecoder(
            h, c["dec_layers"], c["dec_ffn_kernel_size"],
            num_heads=c["num_heads"], dropout=c["dropout"])
        self.mel_out = nn.Dense(self.out_dims,
                                kernel_init=nn.initializers.xavier_uniform())
        if c["use_spk_embed"]:
            self.spk_embed_proj = nn.Dense(
                h, kernel_init=nn.initializers.xavier_uniform())
        elif c["use_spk_id"]:
            self.spk_embed_proj = Embedding(c["num_spk"] + 1, h)
        ph = c["predictor_hidden"] if c["predictor_hidden"] > 0 else h
        self.dur_predictor = DurationPredictor(
            ph, n_layers=c["dur_predictor_layers"],
            kernel_size=c["dur_predictor_kernel"],
            dropout=c["predictor_dropout"])
        if c["use_pitch_embed"]:
            self.pitch_embed = Embedding(300, h, padding_idx=0)
            if c["pitch_type"] == "cwt":
                self.cwt_predictor = PitchPredictor(
                    ph, odim=11 if c["use_uv"] else 10,
                    n_layers=c["predictor_layers"],
                    kernel_size=c["predictor_kernel"],
                    dropout=c["predictor_dropout"])
                self.cwt_stats_layers = nn.Sequential([
                    nn.Dense(h), jax.nn.relu, nn.Dense(h), jax.nn.relu,
                    nn.Dense(2)])
            else:
                self.pitch_predictor = PitchPredictor(
                    ph, odim=2 if c["pitch_type"] == "frame" else 1,
                    n_layers=c["predictor_layers"],
                    kernel_size=c["predictor_kernel"],
                    dropout=c["predictor_dropout"])
        if c["use_energy_embed"]:
            self.energy_embed = Embedding(256, h, padding_idx=0)
            self.energy_predictor = PitchPredictor(
                ph, odim=1, n_layers=c["predictor_layers"],
                kernel_size=c["predictor_kernel"],
                dropout=c["predictor_dropout"])

    # ------------------------------------------------------------------ dur
    def add_dur(self, dur_inp: jnp.ndarray, mel2ph: Optional[jnp.ndarray],
                txt_tokens: jnp.ndarray, ret: Dict, *, infer: bool,
                max_frames: int, deterministic: bool) -> jnp.ndarray:
        """Duration predict; build mel2ph at inference (fs2.py:151-174)."""
        src_nonpadding = (txt_tokens > 0).astype(jnp.float32)
        dur_inp = grad_scale(dur_inp, self.cfg["predictor_grad"])
        log_dur = self.dur_predictor(dur_inp, src_nonpadding,
                                     deterministic=deterministic)
        ret["dur"] = log_dur
        if mel2ph is None:
            assert infer
            dur = DurationPredictor.out2dur(log_dur)
            ret["dur_choice"] = dur
            mel2ph = jax.lax.stop_gradient(
                length_regulator(dur, 1 - src_nonpadding, max_frames))
        ret["mel2ph"] = mel2ph
        return mel2ph

    # ---------------------------------------------------------------- pitch
    def add_pitch(self, pitch_inp: jnp.ndarray, f0: Optional[jnp.ndarray],
                  uv: Optional[jnp.ndarray], mel2ph: jnp.ndarray, ret: Dict,
                  *, encoder_out: Optional[jnp.ndarray] = None,
                  deterministic: bool = True) -> jnp.ndarray:
        """Pitch embedding, all three reference variants (fs2.py:185-231):
        ``frame`` (per-frame f0+uv), ``cwt`` (10-scale wavelet spectrogram +
        per-utterance stats), ``ph`` (phone-level f0 gathered to frames)."""
        c = self.cfg
        pitch_padding = mel2ph == 0
        tgt_nonpadding = (mel2ph > 0).astype(jnp.float32)
        pitch_inp = grad_scale(pitch_inp, c["predictor_grad"])

        if c["pitch_type"] == "cwt":
            from stylesinger_tpu.dsp.cwt import cwt2f0
            from stylesinger_tpu.dsp.pitch import norm_f0
            cwt_out = self.cwt_predictor(pitch_inp, tgt_nonpadding,
                                         deterministic=deterministic)
            ret["cwt"] = cwt_out
            stats = self.cwt_stats_layers(encoder_out[:, 0, :])  # [B, 2]
            mean = ret["f0_mean"] = stats[:, 0]
            std = ret["f0_std"] = stats[:, 1]
            if f0 is None:
                std_s = std * c.get("cwt_std_scale", 0.8)
                f0_hz = cwt2f0(cwt_out[:, :, :10], mean, std_s)
                f0 = norm_f0(f0_hz, None, pitch_norm=c["pitch_norm"],
                             f0_mean=c["f0_mean"], f0_std=c["f0_std"])
                if c["use_uv"]:
                    uv = (cwt_out[:, :, -1] > 0).astype(jnp.float32)
            f0_denorm = denorm_f0(
                f0, uv if c["use_uv"] else None, pitch_norm=c["pitch_norm"],
                f0_mean=c["f0_mean"], f0_std=c["f0_std"])
            ret["f0_denorm"] = f0_denorm
            return self.pitch_embed(f0_to_coarse(f0_denorm))

        if c["pitch_type"] == "ph":
            src_nonpadding = (jnp.abs(encoder_out).sum(-1) > 0).astype(
                jnp.float32)
            pitch_pred = self.pitch_predictor(
                grad_scale(encoder_out, c["predictor_grad"]),
                src_nonpadding, deterministic=deterministic)
            ret["pitch_pred"] = pitch_pred
            if f0 is None:
                f0 = pitch_pred[:, :, 0]
            f0_denorm = denorm_f0(f0, None, pitch_norm=c["pitch_norm"],
                                  f0_mean=c["f0_mean"], f0_std=c["f0_std"])
            ret["f0_denorm"] = f0_denorm
            pitch = f0_to_coarse(f0_denorm)          # [B, T_txt]
            pitch = jnp.pad(pitch, ((0, 0), (1, 0)))
            pitch = jnp.take_along_axis(pitch, mel2ph, axis=1)  # [B, T_mel]
            return self.pitch_embed(pitch)

        pitch_pred = self.pitch_predictor(pitch_inp, tgt_nonpadding,
                                          deterministic=deterministic)
        ret["pitch_pred"] = pitch_pred
        if f0 is None:
            f0 = pitch_pred[:, :, 0]
            if c["use_uv"]:
                uv = (pitch_pred[:, :, 1] > 0).astype(jnp.float32)
        f0_denorm = denorm_f0(
            f0, uv if c["use_uv"] else None, pitch_norm=c["pitch_norm"],
            f0_mean=c["f0_mean"], f0_std=c["f0_std"],
            pitch_padding=pitch_padding)
        ret["f0_denorm"] = f0_denorm
        pitch = f0_to_coarse(f0_denorm)
        return self.pitch_embed(pitch)

    def add_energy(self, inp: jnp.ndarray, energy: Optional[jnp.ndarray],
                   ret: Dict, nonpadding: jnp.ndarray,
                   deterministic: bool = True) -> jnp.ndarray:
        inp = grad_scale(inp, self.cfg["predictor_grad"])
        pred = self.energy_predictor(inp, nonpadding,
                                     deterministic=deterministic)[:, :, 0]
        ret["energy_pred"] = pred
        if energy is None:
            energy = pred
        bins = jnp.clip((energy * 256 // 4).astype(jnp.int32), 0, 255)
        return self.energy_embed(bins)

    # -------------------------------------------------------------- decoder
    def run_decoder(self, decoder_inp: jnp.ndarray,
                    tgt_nonpadding: jnp.ndarray,
                    deterministic: bool = True) -> jnp.ndarray:
        x = self.decoder(decoder_inp, tgt_nonpadding,
                         deterministic=deterministic)
        return self.mel_out(x) * tgt_nonpadding[..., None]

    # ------------------------------------------------------------- forward
    def __call__(self, txt_tokens: jnp.ndarray,
                 mel2ph: Optional[jnp.ndarray] = None,
                 spk_embed: Optional[jnp.ndarray] = None,
                 f0: Optional[jnp.ndarray] = None,
                 uv: Optional[jnp.ndarray] = None,
                 energy: Optional[jnp.ndarray] = None,
                 infer: bool = False, max_frames: Optional[int] = None,
                 deterministic: Optional[bool] = None) -> Dict:
        c = self.cfg
        if deterministic is None:
            deterministic = infer
        if max_frames is None:
            max_frames = c["max_frames"]
        ret: Dict = {}
        encoder_out = self.encoder(txt_tokens, deterministic=deterministic)
        src_nonpadding = (txt_tokens > 0).astype(jnp.float32)[:, :, None]

        if c["use_spk_embed"] or c["use_spk_id"]:
            spk = self.spk_embed_proj(spk_embed)[:, None, :]
        else:
            spk = 0.0

        dur_inp = (encoder_out + spk) * src_nonpadding
        mel2ph = self.add_dur(dur_inp, mel2ph, txt_tokens, ret, infer=infer,
                              max_frames=max_frames,
                              deterministic=deterministic)
        tgt_nonpadding = (mel2ph > 0).astype(jnp.float32)
        decoder_inp = expand_states(encoder_out, mel2ph)

        pitch_inp = (decoder_inp + spk) * tgt_nonpadding[..., None]
        if c["use_pitch_embed"]:
            decoder_inp = decoder_inp + self.add_pitch(
                pitch_inp, f0, uv, mel2ph, ret, encoder_out=encoder_out,
                deterministic=deterministic)
        if c["use_energy_embed"]:
            decoder_inp = decoder_inp + self.add_energy(
                pitch_inp, energy, ret, tgt_nonpadding,
                deterministic=deterministic)

        decoder_inp = (decoder_inp + spk) * tgt_nonpadding[..., None]
        ret["decoder_inp"] = decoder_inp
        ret["mel_out"] = self.run_decoder(decoder_inp, tgt_nonpadding,
                                          deterministic=deterministic)
        return ret
