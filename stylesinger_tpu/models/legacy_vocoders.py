"""Legacy/alternative vocoders: Parallel WaveGAN, MelGAN, PQMF subbands.

Parity targets (AaronZ345/StyleSinger ``modules/parallel_wavegan/**``):
- ``ParallelWaveGANGenerator`` (models/parallel_wavegan.py): noise-driven
  non-causal WaveNet (30 layers, 3 cycles) with upsampled mel conditioning;
- ``MelGANGenerator`` (models/melgan.py): transposed-conv upsampling +
  dilated residual stacks, reflection-padded, tanh out;
- ``PQMF`` (layers/pqmf.py): near-perfect-reconstruction pseudo-QMF bank
  (kaiser prototype) for multi-band vocoding.

These are the reference's alternate vocoder family (the active model is the
NSF HiFi-GAN in models/hifigan.py); they are provided for capability parity
and multi-band experiments, registered in ``vocoder_infer``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# PQMF
# ---------------------------------------------------------------------------

def design_prototype_filter(taps: int = 62, cutoff: float = 0.142,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass prototype (pqmf.py:23-50)."""
    assert taps % 2 == 0
    n = np.arange(taps + 1) - taps / 2
    with np.errstate(invalid="ignore", divide="ignore"):
        h_i = np.sin(np.pi * cutoff * n) / (np.pi * cutoff * n)
    h_i[taps // 2] = 1.0
    # kaiser window
    from numpy import i0
    w = i0(beta * np.sqrt(1 - (2 * np.arange(taps + 1) / taps - 1) ** 2)) \
        / i0(beta)
    return (h_i * cutoff * w).astype(np.float64)


class PQMF:
    """Analysis/synthesis filterbank over ``subbands`` channels."""

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff: float = 0.142, beta: float = 9.0):
        h_proto = design_prototype_filter(taps, cutoff, beta)
        h_analysis = np.zeros((subbands, len(h_proto)))
        h_synthesis = np.zeros((subbands, len(h_proto)))
        for k in range(subbands):
            arg = ((2 * k + 1) * (np.pi / (2 * subbands)) *
                   (np.arange(taps + 1) - taps / 2))
            phi = (-1) ** k * np.pi / 4
            h_analysis[k] = 2 * h_proto * np.cos(arg + phi)
            h_synthesis[k] = 2 * h_proto * np.cos(arg - phi)
        self.subbands = subbands
        self.taps = taps
        self.h_analysis = jnp.asarray(h_analysis, jnp.float32)
        self.h_synthesis = jnp.asarray(h_synthesis, jnp.float32)

    def analysis(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T // subbands, subbands]."""
        x = wav[:, None, :]  # NCW
        k = self.h_analysis[:, None, :].transpose(2, 1, 0)  # WIO (correlation)
        y = jax.lax.conv_general_dilated(
            x, k, (self.subbands,), [(self.taps // 2, self.taps // 2)],
            dimension_numbers=("NCW", "WIO", "NCW"))
        return y.transpose(0, 2, 1)

    def synthesis(self, subband: jnp.ndarray) -> jnp.ndarray:
        """[B, T', subbands] -> [B, T' * subbands]."""
        b, t, s = subband.shape
        # upsample each band by zero-stuffing then filter-and-sum
        up = jnp.zeros((b, s, t * s)).at[:, :, :: s].set(
            subband.transpose(0, 2, 1)) * s
        k = self.h_synthesis[None, :, :].transpose(2, 1, 0)  # [W, S, 1]
        y = jax.lax.conv_general_dilated(
            up, k, (1,), [(self.taps // 2, self.taps // 2)],
            dimension_numbers=("NCW", "WIO", "NCW"))
        return y[:, 0]


# ---------------------------------------------------------------------------
# Parallel WaveGAN generator
# ---------------------------------------------------------------------------

class PWGResidualBlock(nn.Module):
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B, T, Cr], c [B, T, Ca] -> (residual out, skip)."""
        h = nn.Conv(self.gate_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    name="conv")(x)
        h = h + nn.Conv(self.gate_channels, (1,), use_bias=False,
                        name="aux")(c)
        a, b = jnp.split(h, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)
        res = nn.Conv(self.residual_channels, (1,), name="res")(z)
        skip = nn.Conv(self.skip_channels, (1,), name="skip")(z)
        return (x + res) * math.sqrt(0.5), skip


class ParallelWaveGANGenerator(nn.Module):
    """Noise + upsampled mel -> wav (models/parallel_wavegan.py:24-160)."""
    cfg: Any
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64

    @nn.compact
    def __call__(self, mel: jnp.ndarray, noise: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        hop = self.cfg["hop_size"]
        b, t_mel, _ = mel.shape
        t = t_mel * hop
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"), (b, t, 1))
        # nearest-neighbour conditioning upsample + smoothing conv
        c = jnp.repeat(mel, hop, axis=1)
        c = nn.Conv(mel.shape[-1], (hop * 2 + 1,), padding="SAME",
                    name="upsample_smooth")(c)
        x = nn.Conv(self.residual_channels, (1,), name="first")(noise)
        skips = 0.0
        layers_per_stack = self.layers // self.stacks
        for i in range(self.layers):
            dilation = 2 ** (i % layers_per_stack)
            x, s = PWGResidualBlock(
                self.residual_channels, self.gate_channels,
                self.skip_channels, mel.shape[-1], 3, dilation,
                name=f"block_{i}")(x, c)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)
        y = jax.nn.relu(skips)
        y = nn.Conv(self.skip_channels, (1,), name="post1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(1, (1,), name="post2")(y)
        return jnp.tanh(y)[..., 0]


# ---------------------------------------------------------------------------
# MelGAN generator
# ---------------------------------------------------------------------------

class MelGANResStack(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(3):
            y = jax.nn.leaky_relu(x, 0.2)
            y = nn.Conv(self.channels, (3,), kernel_dilation=(3 ** i,),
                        padding="SAME", name=f"conv_{i}a")(y)
            y = jax.nn.leaky_relu(y, 0.2)
            y = nn.Conv(self.channels, (1,), name=f"conv_{i}b")(y)
            x = x + y
        return x


class MelGANGenerator(nn.Module):
    """mel -> wav via transposed-conv upsampling + residual stacks
    (models/melgan.py:20-160)."""
    cfg: Any
    base_channels: int = 512

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        rates = tuple(self.cfg["upsample_rates"])
        x = nn.Conv(self.base_channels, (7,), padding="SAME",
                    name="conv_pre")(mel)
        ch = self.base_channels
        for i, r in enumerate(rates):
            ch //= 2
            x = jax.nn.leaky_relu(x, 0.2)
            pad = r * 2 - 1 - (r * 2 - r) // 2
            x = nn.ConvTranspose(ch, (r * 2,), strides=(r,),
                                 padding=((pad, pad),),
                                 transpose_kernel=True,
                                 name=f"up_{i}")(x)
            tgt = mel.shape[1] * int(np.prod(rates[: i + 1]))
            x = x[:, :tgt] if x.shape[1] >= tgt else jnp.pad(
                x, ((0, 0), (0, tgt - x.shape[1]), (0, 0)))
            x = MelGANResStack(ch, name=f"res_{i}")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
