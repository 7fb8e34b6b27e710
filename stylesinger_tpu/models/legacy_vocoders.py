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

def pwg_upsample_scales(cfg: Any) -> Tuple[int, ...]:
    """Conditioning upsample factorization of the hop size (the reference
    ships ``upsample_params: {upsample_scales: [4, 4, 4, 4]}`` for hop 256,
    models/parallel_wavegan.py:41; generalized to any hop)."""
    scales = cfg.get("pwg_upsample_scales")
    if scales:
        return tuple(int(s) for s in scales)
    n, out = int(cfg["hop_size"]), []
    for _ in range(3):
        if n % 4 == 0:
            out.append(4)
            n //= 4
    if n > 1:
        out.append(n)
    return tuple(out)


class PWGUpsampleNetwork(nn.Module):
    """``ConvInUpsampleNetwork`` (layers/upsample.py:126-187): a VALID
    Conv1d over 2*aux_context_window+1 frames (consuming the edge pad),
    then per scale a nearest-neighbour time stretch followed by one
    single-channel (1, 2*scale+1) smoothing kernel shared across mel bins
    (the reference's Conv2d(1, 1, ...) over the (bin, time) plane)."""
    scales: Tuple[int, ...]
    aux_context_window: int = 2

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        """c [B, T_mel + 2w, M] (edge-padded) -> [B, T_mel * hop, M]."""
        w = self.aux_context_window
        c = nn.Conv(c.shape[-1], (2 * w + 1,), padding="VALID",
                    use_bias=False, name="conv_in")(c)
        for i, s in enumerate(self.scales):
            b, t, m = c.shape
            c = jnp.repeat(c, s, axis=1)
            k = self.param(f"up_conv_{i}",
                           nn.initializers.constant(1.0 / (2 * s + 1)),
                           (2 * s + 1, 1, 1))
            y = jax.lax.conv_general_dilated(
                c.transpose(0, 2, 1).reshape(b * m, t * s, 1), k,
                (1,), [(s, s)], dimension_numbers=("NWC", "WIO", "NWC"))
            c = y.reshape(b, m, t * s).transpose(0, 2, 1)
        return c


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
        """x [B, T, Cr], c [B, T, Ca] -> (residual out, skip).

        Identical math to layers/residual_block.py:96-129 — the reference
        splits conv(x) and aux(c) separately before adding; adding first
        and splitting once is the same computation."""
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
    """Noise + upsampled mel -> wav, architecture-exact vs the reference
    ``ParallelWaveGANGenerator`` (models/parallel_wavegan.py:22-171) so
    trained official/custom checkpoints convert 1:1
    (convert.py::convert_pwg; parity: tests/test_convert.py).

    Note: the reference returns the raw last 1x1 conv output — no tanh
    (models/parallel_wavegan.py:156-170)."""
    cfg: Any
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_context_window: int = 2
    use_pitch_embed: bool = False

    @nn.compact
    def __call__(self, mel: jnp.ndarray, noise: Optional[jnp.ndarray] = None,
                 pitch: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """mel [B, T_mel, M] (already feature-stats normalized by the
        wrapper when serving official checkpoints), optional coarse pitch
        [B, T_mel] ints -> wav [B, T_mel * hop]."""
        scales = pwg_upsample_scales(self.cfg)
        hop = int(np.prod(scales))
        b, t_mel, m = mel.shape
        t = t_mel * hop
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"), (b, t, 1))
        c = mel
        if self.use_pitch_embed and pitch is not None:
            p = nn.Embed(300, m, name="pitch_embed")(pitch)
            c = nn.Dense(m, name="c_proj")(jnp.concatenate([c, p], -1))
        # edge pad = the wrapper's np.pad(c, pad_size, "edge")
        # (vocoders/pwg.py:95-101); conv_in consumes it
        w = self.aux_context_window
        c = jnp.pad(c, ((0, 0), (w, w), (0, 0)), mode="edge")
        c = PWGUpsampleNetwork(scales, w, name="upsample_net")(c)
        x = nn.Conv(self.residual_channels, (1,), name="first")(noise)
        skips = 0.0
        layers_per_stack = self.layers // self.stacks
        for i in range(self.layers):
            dilation = 2 ** (i % layers_per_stack)
            x, s = PWGResidualBlock(
                self.residual_channels, self.gate_channels,
                self.skip_channels, m, 3, dilation,
                name=f"block_{i}")(x, c)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)
        y = jax.nn.relu(skips)
        y = nn.Conv(self.skip_channels, (1,), name="post1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(1, (1,), name="post2")(y)
        return y[..., 0]


# ---------------------------------------------------------------------------
# MelGAN generator
# ---------------------------------------------------------------------------

def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """ReflectionPad1d over the time axis of [B, T, C]."""
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect") if p else x


class MelGANResidualStack(nn.Module):
    """``ResidualStack`` (layers/residual_stack.py:13-75): leaky ->
    reflection-padded dilated conv -> leaky -> 1x1 conv, plus a LEARNED
    1x1 skip projection (not an identity shortcut)."""
    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jax.nn.leaky_relu(x, 0.2)
        y = _reflect_pad(y, (self.kernel_size - 1) // 2 * self.dilation)
        y = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    name="conv1")(y)
        y = jax.nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.channels, (1,), name="conv2")(y)
        return y + nn.Conv(self.channels, (1,), name="skip")(x)


class MelGANGenerator(nn.Module):
    """mel -> wav, architecture-exact vs the reference ``MelGANGenerator``
    (models/melgan.py:18-160, non-causal variant) so trained checkpoints
    convert 1:1 (convert.py::convert_melgan): reflection-padded pre/post
    convs, per-scale ConvTranspose (k=2s, torch padding s//2+s%2,
    output_padding s%2 => exact T*s), 3 residual stacks per scale with
    dilations 3**j, tanh out."""
    cfg: Any
    base_channels: int = 512
    stacks: int = 3
    kernel_size: int = 7
    stack_kernel_size: int = 3

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        rates = tuple(self.cfg.get("melgan_upsample_scales")
                      or self.cfg["upsample_rates"])
        x = _reflect_pad(mel, (self.kernel_size - 1) // 2)
        x = nn.Conv(self.base_channels, (self.kernel_size,),
                    padding="VALID", name="conv_pre")(x)
        ch = self.base_channels
        for i, r in enumerate(rates):
            ch //= 2
            x = jax.nn.leaky_relu(x, 0.2)
            # torch ConvTranspose1d(k=2r, stride=r, padding=r//2 + r%2,
            # output_padding=r%2) == padding (k-1-P, k-1-P+op) of the
            # r-dilated input before a VALID conv with the flipped kernel
            k, p_t, op = 2 * r, r // 2 + r % 2, r % 2
            x = nn.ConvTranspose(ch, (k,), strides=(r,),
                                 padding=((k - 1 - p_t, k - 1 - p_t + op),),
                                 transpose_kernel=True,
                                 name=f"up_{i}")(x)
            for j in range(self.stacks):
                x = MelGANResidualStack(
                    ch, self.stack_kernel_size,
                    self.stack_kernel_size ** j, name=f"res_{i}_{j}")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = _reflect_pad(x, (self.kernel_size - 1) // 2)
        x = nn.Conv(1, (self.kernel_size,), padding="VALID",
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
