"""Vocoder inference registry.

Parity target: ``tasks/tts/vocoder_infer/base_vocoder.py:9-29`` in
AaronZ345/StyleSinger (``register_vocoder`` + ``get_vocoder_cls`` +
``BaseVocoder.spec2wav``) and the HifiGAN_NSF wrapper
(``hifigan_nsf.py:46-76``: load latest checkpoint, fold weight norm,
mel+f0 -> wav with optional spectral denoise).

Registered here: ``HifiGAN_NSF`` (flax generator, orbax/TrainState params)
and ``GriffinLim`` (no-checkpoint DSP fallback).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Type

import numpy as np

VOCODERS: Dict[str, Type["BaseVocoder"]] = {}


def register_vocoder(cls: Type["BaseVocoder"]) -> Type["BaseVocoder"]:
    VOCODERS[cls.__name__] = cls
    return cls


def get_vocoder_cls(cfg: Any) -> Type["BaseVocoder"]:
    return VOCODERS[cfg["vocoder"]]


def load_vocoder_params(cfg: Any) -> Optional[Any]:
    """Trained HiFi-GAN generator params from ``cfg['vocoder_ckpt']``:
    a reference torch ``model_ckpt_steps_*.ckpt`` file, a reference work
    dir holding such files (latest wins — base_vocoder.py:20-24), or an
    orbax dir from our vocoder GAN task. None when unset/absent (callers
    fall back to random init with their own warning)."""
    ckpt = cfg.get("vocoder_ckpt", "")
    if not ckpt:
        return None
    if not os.path.exists(ckpt):
        print(f"| WARN: vocoder_ckpt {ckpt} not found; "
              "using random vocoder weights")
        return None
    path = ckpt
    if os.path.isdir(ckpt):
        import glob
        import re
        torch_ckpts = glob.glob(os.path.join(ckpt, "model_ckpt_steps_*.ckpt"))
        if torch_ckpts:
            path = max(torch_ckpts, key=lambda p: int(
                re.findall(r"steps_(\d+)", p)[0]))
        else:
            try:
                import orbax.checkpoint as ocp
                return ocp.StandardCheckpointer().restore(ckpt)["gen_params"]
            except Exception:
                print(f"| WARN: vocoder_ckpt dir {ckpt} has neither torch "
                      "model_ckpt_steps_*.ckpt nor an orbax payload; "
                      "using random vocoder weights")
                return None
    if path.endswith(".ckpt"):
        from stylesinger_tpu.convert import (
            convert_hifigan, load_torch_checkpoint,
        )
        sd = load_torch_checkpoint(path, child="model_gen")
        return convert_hifigan(sd, cfg)["params"]
    return None


class BaseVocoder:
    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        """mel [T, M] -> wav [T * hop]."""
        raise NotImplementedError


@register_vocoder
class HifiGAN_NSF(BaseVocoder):
    def __init__(self, cfg: Any, params: Optional[Any] = None,
                 rng_seed: int = 0):
        import jax

        from stylesinger_tpu.models.hifigan import HifiGanGenerator

        self.cfg = cfg
        self.model = HifiGanGenerator(cfg)
        self._rng = jax.random.PRNGKey(rng_seed)
        if params is None:
            params = self._load_or_init()
        self.params = params
        self._jit = jax.jit(
            lambda p, mel, f0, rng: self.model.apply(
                {"params": p}, mel, f0, rngs={"noise": rng}))

    def _load_or_init(self):
        import jax.numpy as jnp

        params = load_vocoder_params(self.cfg)
        if params is not None:
            return params
        probe_mel = jnp.zeros((1, 16, self.cfg["audio_num_mel_bins"]))
        probe_f0 = jnp.full((1, 16), 200.0)
        return self.model.init({"params": self._rng, "noise": self._rng},
                               probe_mel, probe_f0)["params"]

    def spec2wav(self, mel: np.ndarray, f0: Optional[np.ndarray] = None,
                 **kwargs) -> np.ndarray:
        import jax.numpy as jnp

        c = self.cfg
        mel_b = jnp.asarray(mel)[None]
        if f0 is None:
            f0 = np.zeros(mel.shape[0], np.float32)
        f0_b = jnp.asarray(f0)[None, : mel.shape[0]]
        wav = np.asarray(self._jit(self.params, mel_b, f0_b, self._rng))[0]
        if c.get("vocoder_denoise_c", 0.0) > 0:
            from stylesinger_tpu.dsp.denoise import denoise
            import jax.numpy as jnp2
            wav = np.asarray(denoise(
                jnp2.asarray(wav), c["vocoder_denoise_c"],
                n_fft=c["fft_size"], hop_size=c["hop_size"],
                win_length=c["win_size"]))
        return wav

    def spec2wav_streaming(self, mel: np.ndarray,
                           f0: Optional[np.ndarray] = None,
                           chunk_frames: int = 256,
                           overlap_frames: int = 16) -> np.ndarray:
        """Chunked synthesis with crossfaded overlaps: constant device
        memory and ONE compiled shape regardless of utterance length
        (the streaming-serving mode of BASELINE config 5)."""
        import jax.numpy as jnp

        hop = self.cfg["hop_size"]
        t = mel.shape[0]
        if f0 is None:
            f0 = np.zeros(t, np.float32)
        if t <= chunk_frames:
            return self.spec2wav(mel, f0=f0)
        step = chunk_frames - 2 * overlap_frames
        out = np.zeros(t * hop, np.float32)
        weight = np.zeros(t * hop, np.float32)
        fade = np.ones(chunk_frames * hop, np.float32)
        ramp = np.linspace(0.0, 1.0, overlap_frames * hop, dtype=np.float32)
        fade[: overlap_frames * hop] = ramp
        fade[-overlap_frames * hop:] = ramp[::-1]
        pos = 0
        while pos < t:
            s = min(pos, t - chunk_frames) if t >= chunk_frames else 0
            mel_c = mel[s: s + chunk_frames]
            f0_c = f0[s: s + chunk_frames]
            wav_c = np.asarray(self._jit(
                self.params, jnp.asarray(mel_c)[None],
                jnp.asarray(f0_c)[None], self._rng))[0]
            o = s * hop
            out[o: o + len(wav_c)] += wav_c * fade[: len(wav_c)]
            weight[o: o + len(wav_c)] += fade[: len(wav_c)]
            if s + chunk_frames >= t:
                break
            pos = s + step
        return out / np.maximum(weight, 1e-8)


@register_vocoder
class GriffinLim(BaseVocoder):
    """DSP fallback: approximate linear spec from mel + phase fitting."""

    def __init__(self, cfg: Any):
        self.cfg = cfg

    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        import jax.numpy as jnp

        from stylesinger_tpu.dsp.griffin_lim import griffin_lim, mel_to_linear

        c = self.cfg
        mag = mel_to_linear(
            jnp.asarray(mel), sample_rate=c["audio_sample_rate"],
            n_fft=c["fft_size"], n_mels=c["audio_num_mel_bins"],
            fmin=c["fmin"], fmax=c["fmax"])
        return np.asarray(griffin_lim(
            mag, n_fft=c["fft_size"], hop_size=c["hop_size"],
            win_length=c["win_size"]))


def _find_legacy_ckpt(base: str) -> tuple:
    """Resolve cfg['vocoder_ckpt'] for the legacy PWG/MelGAN wrappers the
    way the reference does (vocoders/pwg.py:55-80): a directory holding
    either OFFICIAL ``checkpoint-*steps.pkl`` (+ config.yaml + stats.h5)
    or CUSTOM ``model_ckpt_steps_*.ckpt`` (latest wins), or a direct file
    path. Returns (ckpt_path|None, stats_path|None, config_path|None)."""
    import glob
    import re

    if not base:
        return None, None, None
    if os.path.isfile(base):
        d = os.path.dirname(base)
        stats = next((p for p in (os.path.join(d, "stats.h5"),
                                  os.path.join(d, "stats.npy"))
                      if os.path.exists(p)), None)
        cfgp = os.path.join(d, "config.yaml")
        return base, stats, cfgp if os.path.exists(cfgp) else None
    if not os.path.isdir(base):
        return None, None, None
    official = glob.glob(os.path.join(base, "checkpoint-*steps.pkl"))
    custom = glob.glob(os.path.join(base, "model_ckpt_steps_*.ckpt"))
    if official:
        ckpt = max(official, key=lambda p: int(
            re.findall(r"checkpoint-(\d+)steps", p)[0]))
    elif custom:
        ckpt = max(custom, key=lambda p: int(
            re.findall(r"steps_(\d+)", p)[0]))
    else:
        return None, None, None
    stats = next((p for p in (os.path.join(base, "stats.h5"),
                              os.path.join(base, "stats.npy"))
                  if os.path.exists(p)), None)
    cfgp = os.path.join(base, "config.yaml")
    return ckpt, stats, cfgp if os.path.exists(cfgp) else None


@register_vocoder
class PWG(BaseVocoder):
    """Parallel WaveGAN (reference vocoders/pwg.py:54-107): loads a
    trained official/custom checkpoint from ``cfg['vocoder_ckpt']`` via
    convert.load_pwg_checkpoint, mean/std-normalizes the input mel with
    the official feature stats when present, and feeds coarse f0 to the
    pitch embedding when the generator was trained with one."""

    def __init__(self, cfg: Any, params: Optional[Any] = None):
        import jax
        import jax.numpy as jnp

        from stylesinger_tpu.models.legacy_vocoders import (
            ParallelWaveGANGenerator, pwg_upsample_scales,
        )

        self.cfg = cfg
        self.stats = None
        # cfg-level architecture hints (the reference's custom task
        # checkpoints carry their generator dims in the experiment hparams,
        # not a config.yaml — vocoders/pwg.py:24-30); checkpoint-derived
        # values overlay these below, weights win over everything
        gen_kw: Dict[str, Any] = {
            "layers": int(cfg.get("pwg_layers", 30)),
            "stacks": int(cfg.get("pwg_stacks", 3)),
            "residual_channels": int(cfg.get("pwg_residual_channels", 64)),
            "gate_channels": int(cfg.get("pwg_gate_channels", 128)),
            "skip_channels": int(cfg.get("pwg_skip_channels", 64)),
            "aux_context_window": int(cfg.get("pwg_aux_context_window", 2)),
            "use_pitch_embed": bool(cfg.get("pwg_use_pitch_embed", False)),
        }
        if params is None:
            ckpt, stats_p, cfg_p = _find_legacy_ckpt(
                cfg.get("vocoder_ckpt", ""))
            if ckpt is not None:
                from stylesinger_tpu.convert import load_pwg_checkpoint
                variables, self.stats, gp = load_pwg_checkpoint(
                    ckpt, stats_path=stats_p, config_path=cfg_p)
                params = variables["params"]
                gen_kw.update({
                    "layers": int(gp.get("layers", gen_kw["layers"])),
                    "stacks": int(gp.get("stacks", gen_kw["stacks"])),
                    "residual_channels": int(gp.get(
                        "residual_channels", gen_kw["residual_channels"])),
                    "gate_channels": int(gp.get(
                        "gate_channels", gen_kw["gate_channels"])),
                    "skip_channels": int(gp.get(
                        "skip_channels", gen_kw["skip_channels"])),
                    "aux_context_window": int(gp.get(
                        "upsample_params", {}).get(
                        "aux_context_window",
                        gp.get("aux_context_window",
                               gen_kw["aux_context_window"]))),
                    "use_pitch_embed": bool(gp.get(
                        "use_pitch_embed", gen_kw["use_pitch_embed"])),
                })
                if "stacks" not in gp and "pwg_stacks" not in cfg:
                    # the dilation schedule leaves no trace in the kernel
                    # shapes, so a wrong default loads cleanly and produces
                    # corrupt audio with no error — make it loud
                    print("| WARN: PWG 'stacks' not in config.yaml and no "
                          f"pwg_stacks in cfg; assuming {gen_kw['stacks']} "
                          "(dilation schedule is NOT recoverable from the "
                          "weights — set pwg_stacks if training differed)")
                scales = gp.get("upsample_params", {}).get(
                    "upsample_scales")
                if scales:
                    cfg = dict(cfg)
                    cfg["pwg_upsample_scales"] = list(scales)
                    self.cfg = cfg
                print(f"| Loaded PWG vocoder from {ckpt}"
                      + (" (+feature stats)" if self.stats else ""))
            elif cfg.get("vocoder_ckpt", ""):
                print(f"| WARN: vocoder_ckpt {cfg['vocoder_ckpt']} has no "
                      "PWG checkpoint; using random weights")
        self.model = ParallelWaveGANGenerator(self.cfg, **gen_kw)
        self._rng = jax.random.PRNGKey(0)
        hop = int(np.prod(pwg_upsample_scales(self.cfg)))
        if hop != int(cfg["hop_size"]):
            print(f"| WARN: PWG upsample scales multiply to {hop} but the "
                  f"pipeline hop_size is {cfg['hop_size']}; wav lengths "
                  "will disagree with frames*hop_size")
        if params is None:
            probe = jnp.zeros((1, 8, cfg["audio_num_mel_bins"]))
            pitch = (jnp.zeros((1, 8), jnp.int32)
                     if gen_kw.get("use_pitch_embed") else None)
            params = self.model.init(
                {"params": self._rng, "noise": self._rng}, probe,
                pitch=pitch)["params"]
        self.params = params
        self._jit = jax.jit(lambda p, mel, pitch, rng: self.model.apply(
            {"params": p}, mel, pitch=pitch, rngs={"noise": rng}))

    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        import jax.numpy as jnp

        c = np.asarray(mel, np.float32)
        if self.stats is not None:  # official-ckpt normalization
            c = (c - self.stats["mean"]) / self.stats["scale"]
        pitch = None
        if self.model.use_pitch_embed:
            from stylesinger_tpu.dsp.pitch import f0_to_coarse
            f0 = kwargs.get("f0")
            if f0 is None:
                f0 = np.zeros(c.shape[0], np.float32)
            pitch = np.asarray(
                f0_to_coarse(jnp.asarray(f0[: c.shape[0]])))[None]
        return np.asarray(self._jit(
            self.params, jnp.asarray(c)[None],
            None if pitch is None else jnp.asarray(pitch),
            self._rng))[0]


@register_vocoder
class MelGAN(BaseVocoder):
    """MelGAN (reference modules/parallel_wavegan/models/melgan.py:18-160,
    wrapper semantics of vocoders/pwg.py): trained official/custom
    checkpoint loading + official feature-stats mel normalization."""

    def __init__(self, cfg: Any, params: Optional[Any] = None):
        import jax
        import jax.numpy as jnp

        from stylesinger_tpu.models.legacy_vocoders import MelGANGenerator

        self.cfg = cfg
        self.stats = None
        gen_kw: Dict[str, Any] = {}
        if params is None:
            ckpt, stats_p, _ = _find_legacy_ckpt(
                cfg.get("vocoder_ckpt", ""))
            if ckpt is not None:
                from stylesinger_tpu.convert import load_melgan_checkpoint
                variables, self.stats, gp = load_melgan_checkpoint(
                    ckpt, stats_path=stats_p)
                params = variables["params"]
                # build the generator to the CHECKPOINT's architecture
                # (scales/width inferred from the trained kernels), not
                # the repo config — vocoders/pwg.py:24-30 semantics
                gen_kw = {"base_channels": gp["base_channels"]}
                cfg = dict(cfg)
                cfg["melgan_upsample_scales"] = list(gp["upsample_scales"])
                self.cfg = cfg
                print(f"| Loaded MelGAN vocoder from {ckpt}"
                      + (" (+feature stats)" if self.stats else ""))
            elif cfg.get("vocoder_ckpt", ""):
                print(f"| WARN: vocoder_ckpt {cfg['vocoder_ckpt']} has no "
                      "MelGAN checkpoint; using random weights")
        self.model = MelGANGenerator(cfg, **gen_kw)
        hop = int(np.prod(cfg.get("melgan_upsample_scales")
                          or cfg["upsample_rates"]))
        if hop != int(cfg["hop_size"]):
            # same guard as the PWG path: a checkpoint trained at another
            # hop loads cleanly but silently breaks frame<->sample
            # bookkeeping (wav lengths, RTF wav_sec) by hop/hop_size
            print(f"| WARN: MelGAN upsample scales multiply to {hop} but "
                  f"the pipeline hop_size is {cfg['hop_size']}; wav "
                  "lengths will disagree with frames*hop_size")
        self._rng = jax.random.PRNGKey(0)
        if params is None:
            probe = jnp.zeros((1, 8, cfg["audio_num_mel_bins"]))
            params = self.model.init({"params": self._rng}, probe)["params"]
        self.params = params
        self._jit = jax.jit(lambda p, mel: self.model.apply(
            {"params": p}, mel))

    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        import jax.numpy as jnp

        c = np.asarray(mel, np.float32)
        if self.stats is not None:
            c = (c - self.stats["mean"]) / self.stats["scale"]
        return np.asarray(self._jit(self.params, jnp.asarray(c)[None]))[0]
