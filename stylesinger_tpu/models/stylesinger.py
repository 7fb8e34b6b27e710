"""StyleSinger: zero-shot style-transfer singing voice synthesis (flax).

Behavioral parity target: ``StyleSinger``
(``modules/StyleSinger/stylesinger.py:42-332`` in AaronZ345/StyleSinger):
FS2 phoneme encoder + NoteEncoder sum -> spk/emo projection -> duration ->
length-regulate -> UMLN -> RSA style (WN + ConvBlocks + RQ + ProsodyAligner)
-> dual Gaussian-multinomial F0 diffusion -> FFT decoder (+ shallow mel
diffusion post-net) -> mel.

TPU-native design:
- curriculum switches (``rq_start`` / ``forcing`` / ``diff_start``,
  egs/stylesinger.yaml:106-133) are **static** call flags -> at most four
  compiled graphs over a training run instead of traced branching;
- all diffusion sampling loops are ``lax.scan`` (see models/diffusion.py);
- randomness flows through named PRNG streams: 'dropout', 'umln', 'rq',
  'diffusion';
- shapes are static: ``mel2ph`` is always [B, max_frames], masks carry true
  lengths.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.dsp.align import expand_states
from stylesinger_tpu.dsp.pitch import denorm_f0, f0_to_coarse
from stylesinger_tpu.models import diffusion as diff
from stylesinger_tpu.models.common import (
    DurationPredictor, Embedding, FastspeechDecoder, FastspeechEncoder,
    PitchPredictor, SinusoidalPositionalEmbedding, length_regulator,
)
from stylesinger_tpu.models.diffnet import DDiffNet, DiffNet, FFTDenoiser
from stylesinger_tpu.models.fs2 import grad_scale
from stylesinger_tpu.models.style import LocalStyleAdaptor, ProsodyAligner
from stylesinger_tpu.models.umln import UMLN

# minmax normalization bounds for log2-F0 (reference stylesinger.py:254-262)
_LF0_MIN = 6.0
_LF0_MAX = 10.0


def minmax_norm_lf0(x: jnp.ndarray,
                    uv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    x = jnp.minimum(x, _LF0_MAX)
    normed = (x - _LF0_MIN) / (_LF0_MAX - _LF0_MIN) * 2 - 1
    if uv is not None:
        normed = jnp.where(uv > 0, 0.0, normed)
    return normed


def minmax_denorm_lf0(x: jnp.ndarray,
                      uv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    denormed = (x + 1) / 2 * (_LF0_MAX - _LF0_MIN) + _LF0_MIN
    if uv is not None:
        denormed = jnp.where(uv > 0, 0.0, denormed)
    return denormed


class NoteEncoder(nn.Module):
    """MIDI note embedding: pitch emb + type emb (both * sqrt(H)) + linear
    duration (reference stylesinger.py:21-36)."""
    hidden_size: int
    n_vocab: int = 100
    n_types: int = 5

    @nn.compact
    def __call__(self, note: jnp.ndarray, note_dur: jnp.ndarray,
                 note_type: jnp.ndarray) -> jnp.ndarray:
        s = math.sqrt(self.hidden_size)
        x = Embedding(self.n_vocab, self.hidden_size, name="emb")(note) * s
        t = Embedding(self.n_types, self.hidden_size,
                      name="type_emb")(note_type) * s
        d = nn.Dense(self.hidden_size, name="dur_ln")(note_dur[..., None])
        return x + t + d


class StyleSinger(nn.Module):
    """Flagship acoustic model. Call with static phase flags.

    Returns a dict: mel_out (+ diff_mel_out when ``use_diff``), mel2ph, dur,
    pitch_pred, f0_denorm, style, losses (rq_loss, gloss, mdiff*/gdiff*,
    diff_loss) depending on phase.
    """
    cfg: Any
    vocab_size: int

    def setup(self):
        c = self.cfg
        h = c["hidden_size"]
        self.encoder = FastspeechEncoder(
            self.vocab_size, h, c["enc_layers"], c["enc_ffn_kernel_size"],
            num_heads=c["num_heads"], dropout=c["dropout"],
            rel_pos=bool(c.get("rel_pos", False)))
        self.note_encoder = NoteEncoder(h, c["note_vocab"],
                                        c["note_type_vocab"])
        if c.get("use_spk_id", False):
            # integer speaker ids instead of d-vectors (fs2.py:37-40)
            self.spk_embed_proj = Embedding(c["num_spk"] + 1, h)
        else:
            self.spk_embed_proj = nn.Dense(
                h, kernel_init=nn.initializers.xavier_uniform())
        if c["emo"]:
            self.emo_embed_proj = nn.Dense(
                h, kernel_init=nn.initializers.xavier_uniform())
        if c["umln"]:
            self.norm = UMLN(h, p=0.5)
        if c["style"]:
            self.style_extractor = LocalStyleAdaptor(
                h, n_codes=c["nRQ"], rq_depth=c["rq_depth"],
                rq_decay=c["rq_decay"], vae_dropout=c["vae_dropout"],
                mel_bins=c["audio_num_mel_bins"],
                wn_layers=c.get("style_wn_layers", 4),
                conv_dilations=tuple(c.get("style_conv_dilations",
                                           (1, 1, 1, 1, 1))))
            self.style_pos = SinusoidalPositionalEmbedding(h)
            self.l1 = nn.Dense(h,
                               kernel_init=nn.initializers.xavier_uniform())
            self.align = ProsodyAligner(
                h, num_layers=c["aligner_layers"], num_heads=c["num_heads"],
                ffn_dim=c["aligner_ffn_dim"],
                guided_sigma=c["guided_sigma"])
        ph = c["predictor_hidden"] if c["predictor_hidden"] > 0 else h
        self.dur_predictor = DurationPredictor(
            ph, n_layers=c["dur_predictor_layers"],
            kernel_size=c["dur_predictor_kernel"],
            dropout=c["predictor_dropout"])
        self.pitch_embed = Embedding(300, h, padding_idx=0)
        if c["f0_gen"] == "gmdiff":
            self.gm_diffnet = DDiffNet(
                in_dims=1, num_classes=2,
                residual_layers=c["f0_residual_layers"],
                residual_channels=c["f0_residual_channels"],
                dilation_cycle_length=c["f0_dilation_cycle_length"])
            self.gm_diffnet_inpainte = DDiffNet(
                in_dims=1, num_classes=2,
                residual_layers=c["f0_residual_layers"],
                residual_channels=c["f0_residual_channels"],
                dilation_cycle_length=c["f0_dilation_cycle_length"])
            self.f0_sched = diff.make_schedule(
                c["f0_timesteps"], c["f0_max_beta"], "linear")
        else:
            self.pitch_predictor = PitchPredictor(
                ph, odim=2, n_layers=5, kernel_size=c["predictor_kernel"],
                dropout=0.1)
            self.pitch_inpainter_predictor = PitchPredictor(
                ph, odim=2, n_layers=5, kernel_size=c["predictor_kernel"],
                dropout=0.1)
        self.decoder = FastspeechDecoder(
            h, c["dec_layers"], c["dec_ffn_kernel_size"],
            num_heads=c["num_heads"], dropout=c["dropout"])
        self.mel_out = nn.Dense(c["audio_num_mel_bins"],
                                kernel_init=nn.initializers.xavier_uniform())
        if c["decoder"] in ("diffsinger", "prodiff"):
            # DIFF_DECODERS registry (reference stylesinger.py:38-40 ships
            # 'wavenet'; 'fft' is the candidate_decoder.py FFT denoiser)
            if c.get("diff_decoder_type", "wavenet") == "fft":
                self.postdiff = FFTDenoiser(
                    in_dims=c["audio_num_mel_bins"],
                    hidden_size=c["hidden_size"],
                    residual_channels=c["residual_channels"],
                    num_layers=c["dec_layers"],
                    kernel_size=c["dec_ffn_kernel_size"],
                    num_heads=c["num_heads"])
            else:
                self.postdiff = DiffNet(
                    in_dims=c["audio_num_mel_bins"],
                    residual_layers=c["residual_layers"],
                    residual_channels=c["residual_channels"],
                    dilation_cycle_length=c["dilation_cycle_length"])
        if c["decoder"] == "diffsinger":
            self.mel_sched = diff.make_schedule(
                c["timesteps"], c["max_beta"], c["schedule_type"])
            self.ln_proj = nn.Dense(
                c["hidden_size"],
                kernel_init=nn.initializers.xavier_uniform())
        elif c["decoder"] == "prodiff":
            self.mel_sched = diff.make_prodiff_schedule(
                c["timesteps"], c.get("prodiff_schedule", "vpsde"))
        self.spec_min = np.asarray(c["spec_min"], np.float32)[: c["keep_bins"]]
        self.spec_max = np.asarray(c["spec_max"], np.float32)[: c["keep_bins"]]

    # ------------------------------------------------------------- style
    def get_style(self, decoder_inp, ref_mels, ref_f0, tgt_nonpadding, ret,
                  *, use_rq: bool, forcing: bool, train: bool,
                  deterministic: bool):
        """RSA: style extraction + content-style alignment
        (reference stylesinger.py:189-214)."""
        # EMA codebook updates only in stochastic training mode (the
        # reference gates on self.training)
        ema = train and not deterministic
        rng = self.make_rng("rq") if (ema and use_rq) else None
        style, rq_loss, codes = self.style_extractor(
            ref_mels, ref_f0, use_rq=use_rq, train=ema, rng=rng,
            deterministic=deterministic)
        if rq_loss is not None:
            ret["rq_loss"] = rq_loss
            ret["style_codes"] = codes
        ref_nonpadding = (jnp.abs(ref_mels[:, :, 0]) > 1e-8).astype(
            jnp.float32)
        positions = self.style_pos(ref_nonpadding)
        style = self.l1(jnp.concatenate([style, positions], axis=-1))
        aligned, gloss, attn = self.align(
            decoder_inp, style, tgt_nonpadding, ref_nonpadding,
            forcing=forcing, deterministic=deterministic)
        ret["gloss"] = gloss
        ret["attn"] = attn
        return aligned

    # ------------------------------------------------------------- pitch
    def _gmdiff_pitch(self, cond, f0, uv, nonpadding, net, *,
                      infer: bool, dyn_clip, prefix: str, ret: Dict):
        """One of the dual joint f0+uv diffusions
        (reference stylesinger.py:249-311)."""
        sched = self.f0_sched

        def denoise_fn(f0_t, uv_t, t):
            return net(f0_t, uv_t, t, cond, nonpadding)

        if infer:
            rng = self.make_rng("diffusion")
            f0_s, uv_s = diff.sample_gm(
                denoise_fn, sched, cond.shape[1], cond.shape[0], rng,
                dyn_clip=dyn_clip)
            lf0 = minmax_denorm_lf0(f0_s[..., 0])
            ret[f"gdiff{prefix}"] = 0.0
            ret[f"mdiff{prefix}"] = 0.0
            return jnp.stack([lf0, uv_s], axis=-1)
        rng = self.make_rng("diffusion")
        normed = minmax_norm_lf0(f0)[..., None]
        mloss, gloss = diff.gm_mixed_loss(
            denoise_fn, sched, normed, uv, cond, nonpadding, rng)
        ret[f"mdiff{prefix}"] = mloss
        ret[f"gdiff{prefix}"] = gloss
        return jnp.stack([f0, uv], axis=-1)

    def inpaint_pitch(self, inp_agnostic, inp_specific, f0, uv, mel2ph,
                      midi_notes, ret, *, infer: bool, deterministic: bool):
        """Dual-path pitch prediction, averaged
        (reference stylesinger.py:216-247)."""
        c = self.cfg
        pitch_padding = mel2ph == 0
        nonpadding = (mel2ph > 0).astype(jnp.float32)
        inp_agnostic = grad_scale(inp_agnostic, c["predictor_grad"])
        inp_specific = grad_scale(inp_specific, c["predictor_grad"])

        if c["f0_gen"] == "gmdiff":
            if infer:
                # x0 bounds from MIDI +/- 3 semitones in normed log2-Hz
                # (reference stylesinger.py:275-283)
                lo = (midi_notes - 3.0 - 69.0) / 12.0 + math.log2(440.0)
                hi = (midi_notes + 3.0 - 69.0) / 12.0 + math.log2(440.0)
                lo = jnp.clip(minmax_norm_lf0(lo), -1.0, 1.0)[..., None]
                hi = jnp.clip(minmax_norm_lf0(hi), -1.0, 1.0)[..., None]
                dyn_clip = (lo, hi)

                # both reverse chains fused into one scan (the per-step
                # dispatch dominates at serving batch sizes)
                def fn_a(f0_t, uv_t, t):
                    return self.gm_diffnet(f0_t, uv_t, t, inp_agnostic,
                                           nonpadding)

                def fn_b(f0_t, uv_t, t):
                    return self.gm_diffnet_inpainte(
                        f0_t, uv_t, t, inp_specific, nonpadding)

                rng = self.make_rng("diffusion")
                (fa, ua), (fb, ub) = diff.sample_gm_dual(
                    fn_a, fn_b, self.f0_sched, inp_agnostic.shape[1],
                    inp_agnostic.shape[0], rng, dyn_clip=dyn_clip,
                    speedup=int(c.get("f0_speedup", 1)))
                p_agn = jnp.stack([minmax_denorm_lf0(fa[..., 0]), ua],
                                  axis=-1)
                p_spec = jnp.stack([minmax_denorm_lf0(fb[..., 0]), ub],
                                   axis=-1)
                for k in ("gdiff1", "mdiff1", "gdiff2", "mdiff2"):
                    ret[k] = 0.0
                # rest notes are forced unvoiced (stylesinger.py:288)
                rest = (midi_notes == 0)[..., None]
                p_agn = jnp.where(rest, p_agn.at[..., 1:].set(1.0), p_agn)
                p_spec = jnp.where(rest, p_spec.at[..., 1:].set(1.0),
                                   p_spec)
            else:
                p_agn = self._gmdiff_pitch(
                    inp_agnostic, f0, uv, nonpadding, self.gm_diffnet,
                    infer=False, dyn_clip=None, prefix="1", ret=ret)
                p_spec = self._gmdiff_pitch(
                    inp_specific, f0, uv, nonpadding,
                    self.gm_diffnet_inpainte, infer=False, dyn_clip=None,
                    prefix="2", ret=ret)
        else:
            p_agn = self.pitch_predictor(inp_agnostic, nonpadding,
                                         deterministic=deterministic)
            p_spec = self.pitch_inpainter_predictor(
                inp_specific, nonpadding, deterministic=deterministic)

        pitch_pred = p_spec / 2 + p_agn / 2
        ret["pitch_pred"] = pitch_pred

        use_uv = c["pitch_type"] == "frame" and c["use_uv"]
        if f0 is None:  # inference
            f0 = pitch_pred[:, :, 0]
            if use_uv:
                uv = (pitch_pred[:, :, 1] > 0).astype(jnp.float32)
        f0_denorm = denorm_f0(f0, uv if use_uv else None,
                              pitch_norm=c["pitch_norm"],
                              f0_mean=c["f0_mean"], f0_std=c["f0_std"],
                              pitch_padding=pitch_padding)
        ret["f0_denorm"] = f0_denorm
        ret["f0_denorm_pred"] = denorm_f0(
            pitch_pred[:, :, 0],
            (pitch_pred[:, :, 1] > 0).astype(jnp.float32) if use_uv else None,
            pitch_norm=c["pitch_norm"], f0_mean=c["f0_mean"],
            f0_std=c["f0_std"], pitch_padding=pitch_padding)
        pitch = f0_to_coarse(f0_denorm)
        return self.pitch_embed(pitch)

    # ----------------------------------------------------------- decoder
    def run_decoder(self, decoder_inp, tgt_nonpadding, deterministic):
        x = self.decoder(decoder_inp, tgt_nonpadding,
                         deterministic=deterministic)
        return self.mel_out(x) * tgt_nonpadding[..., None]

    def run_diffsinger(self, ref_mels, ret, tgt_nonpadding, *, infer: bool,
                       deterministic: bool = True):
        """Shallow-diffusion mel post-net (reference stylesinger.py:313-331;
        shallow_diffusion_tts.py:284-307)."""
        c = self.cfg
        coarse = ret["mel_out"]
        g = jax.lax.stop_gradient(coarse)
        T = g.shape[1]
        feats = [g]
        if c["use_txt_cond"]:
            feats.append(ret["decoder_inp"])
        feats.append(jnp.broadcast_to(ret["spk_embed"],
                                      (g.shape[0], T, ret["spk_embed"].shape[-1])))
        if c["emo"]:
            feats.append(jnp.broadcast_to(
                ret["emo_embed"], (g.shape[0], T, ret["emo_embed"].shape[-1])))
        if c["style"]:
            feats.append(ret["style"])
        cond = self.ln_proj(jnp.concatenate(feats, axis=-1))

        def denoise_fn(x_t, t):
            if isinstance(self.postdiff, FFTDenoiser):
                # the FFT denoiser carries dropout (reference
                # candidate_decoder.py:80 runs it in train mode)
                return self.postdiff(x_t, t, cond,
                                     deterministic=deterministic)
            return self.postdiff(x_t, t, cond)

        rng = self.make_rng("diffusion")
        if infer:
            coarse_norm = diff.norm_spec(coarse, self.spec_min, self.spec_max)
            speedup = int(c.get("pndm_speedup", 1) or 1)
            dpm_steps = int(c.get("dpm_steps", 0) or 0)
            if dpm_steps > 0:
                x = diff.sample_shallow_dpmpp(denoise_fn, self.mel_sched,
                                              coarse_norm, rng, c["K_step"],
                                              dpm_steps)
            elif speedup > 1:
                x = diff.sample_shallow_plms(denoise_fn, self.mel_sched,
                                             coarse_norm, rng, c["K_step"],
                                             speedup)
            else:
                x = diff.sample_shallow(denoise_fn, self.mel_sched,
                                        coarse_norm, rng, c["K_step"])
            mel = diff.denorm_spec(x, self.spec_min, self.spec_max)
            ret["mel_out"] = mel * tgt_nonpadding[..., None]
        else:
            x_start = diff.norm_spec(ref_mels, self.spec_min, self.spec_max)
            ret["diff_loss"] = diff.shallow_p_losses(
                denoise_fn, self.mel_sched, x_start, cond, rng, c["K_step"],
                nonpadding=tgt_nonpadding)

    # ----------------------------------------------------------- forward
    def __call__(self, txt_tokens: jnp.ndarray,
                 mel2ph: Optional[jnp.ndarray] = None,
                 spk_embed: Optional[jnp.ndarray] = None,
                 emo_embed: Optional[jnp.ndarray] = None,
                 ref_mels: Optional[jnp.ndarray] = None,
                 ref_f0: Optional[jnp.ndarray] = None,
                 f0: Optional[jnp.ndarray] = None,
                 uv: Optional[jnp.ndarray] = None,
                 note: Optional[jnp.ndarray] = None,
                 note_dur: Optional[jnp.ndarray] = None,
                 note_type: Optional[jnp.ndarray] = None,
                 *, infer: bool = False, use_rq: bool = True,
                 forcing: bool = False, use_diff: bool = True,
                 skip_decoder: bool = False,
                 max_frames: Optional[int] = None,
                 deterministic: Optional[bool] = None) -> Dict:
        c = self.cfg
        train = not infer
        if deterministic is None:
            deterministic = infer
        if max_frames is None:
            max_frames = c["max_frames"]
        ret: Dict = {}

        encoder_out = self.encoder(txt_tokens, deterministic=deterministic)
        encoder_out = encoder_out + self.note_encoder(note, note_dur,
                                                      note_type)
        src_nonpadding = (txt_tokens > 0).astype(jnp.float32)[:, :, None]

        if self.cfg.get("use_spk_id", False):
            spk = self.spk_embed_proj(spk_embed.astype(jnp.int32))[:, None, :]
        else:
            spk = self.spk_embed_proj(spk_embed)[:, None, :]
        ret["spk_embed"] = spk
        emo = 0.0
        if c["emo"]:
            emo = self.emo_embed_proj(emo_embed)[:, None, :]
            ret["emo_embed"] = emo

        # duration
        dur_inp = (encoder_out + spk + emo) * src_nonpadding
        dur_inp = grad_scale(dur_inp, c["predictor_grad"])
        log_dur = self.dur_predictor(
            dur_inp, src_nonpadding[..., 0], deterministic=deterministic)
        ret["dur"] = log_dur
        if mel2ph is None:
            dur = DurationPredictor.out2dur(log_dur)
            ret["dur_choice"] = dur
            mel2ph = jax.lax.stop_gradient(length_regulator(
                dur, 1 - src_nonpadding[..., 0], max_frames))
        ret["mel2ph"] = mel2ph
        tgt_nonpadding = (mel2ph > 0).astype(jnp.float32)
        decoder_inp = expand_states(encoder_out, mel2ph)

        # UMLN (active only in stochastic training mode, like the
        # reference's self.training gate)
        if c["umln"]:
            decoder_inp = self.norm(decoder_inp, spk + emo,
                                    train=train and not deterministic)

        # style
        style = 0.0
        if c["style"]:
            style = self.get_style(
                decoder_inp, ref_mels, ref_f0, tgt_nonpadding, ret,
                use_rq=use_rq or infer, forcing=forcing and train,
                train=train, deterministic=deterministic)
            ret["style"] = style

        # pitch (dual-path)
        midi_notes = None
        if infer:
            midi_notes = expand_states(
                note.astype(jnp.float32)[:, :, None], mel2ph)[..., 0]
        inp_agnostic = decoder_inp * tgt_nonpadding[..., None]
        inp_specific = (decoder_inp + spk + emo +
                        (style if c["style"] else 0.0)) * \
            tgt_nonpadding[..., None]
        pitch_embed = self.inpaint_pitch(
            inp_agnostic, inp_specific, f0, uv, mel2ph, midi_notes, ret,
            infer=infer, deterministic=deterministic)

        # decode
        decoder_inp = decoder_inp + spk + emo + pitch_embed
        if c["style"]:
            decoder_inp = decoder_inp + style
        decoder_inp = decoder_inp * tgt_nonpadding[..., None]
        ret["decoder_inp"] = decoder_inp
        if skip_decoder:
            return ret

        if c["decoder"] == "prodiff":
            self.run_prodiff(decoder_inp, ref_mels, ret, tgt_nonpadding,
                             infer=infer, deterministic=deterministic)
            return ret
        ret["mel_out"] = self.run_decoder(decoder_inp, tgt_nonpadding,
                                          deterministic)
        if c["decoder"] == "diffsinger" and use_diff:
            self.run_diffsinger(ref_mels, ret, tgt_nonpadding, infer=infer,
                                deterministic=deterministic)
        return ret

    def run_prodiff(self, decoder_inp, ref_mels, ret, tgt_nonpadding, *,
                    infer: bool, deterministic: bool = True):
        """x0-parameterized few-step diffusion decoder (reference
        modules/diff/prodiff.py:194-224; wired at stylesinger.py:178-179).
        Replaces the FFT decoder entirely; cond is ``decoder_inp``."""
        c = self.cfg

        def denoise_fn(x_t, t):
            if isinstance(self.postdiff, FFTDenoiser):
                return self.postdiff(x_t, t, decoder_inp,
                                     deterministic=deterministic)
            return self.postdiff(x_t, t, decoder_inp)

        rng = self.make_rng("diffusion")
        if infer:
            shape = (decoder_inp.shape[0], decoder_inp.shape[1],
                     c["audio_num_mel_bins"])
            x = diff.sample_prodiff(denoise_fn, self.mel_sched,
                                    c["timesteps"], shape, rng)
            ret["mel_out"] = x * tgt_nonpadding[..., None]
        else:
            x0_pred = diff.prodiff_train(denoise_fn, self.mel_sched,
                                         c["timesteps"], ref_mels, rng)
            ret["mel_out"] = x0_pred * tgt_nonpadding[..., None]
