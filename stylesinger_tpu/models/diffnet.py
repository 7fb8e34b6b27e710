"""DiffWave-style denoiser networks (batch-first JAX re-design).

Parity targets: ``DiffNet`` (mel denoiser, 20 residual layers, 256 channels)
and ``DDiffNet`` (joint f0+uv denoiser, 10 layers, 192 channels) in
``modules/diff/net.py:58-266``.  All convs are [B, T, C]; the stack of
residual layers keeps every matmul/conv MXU-shaped and fuses the gated
nonlinearity elementwise.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from stylesinger_tpu.models import precision


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal diffusion-step embedding (reference net.py:32-44).

    t: [B] (float or int) -> [B, dim].
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(10000) * jnp.arange(half) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


class DiffusionStepMLP(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        dt = precision.compute_dtype()
        emb = timestep_embedding(t, self.dim)
        emb = nn.Dense(self.dim * 4, dtype=dt, name="fc1")(emb)
        emb = mish(emb)
        emb = nn.Dense(self.dim, dtype=dt, name="fc2")(emb)
        return emb


class ResidualBlock(nn.Module):
    """Gated dilated-conv residual block (reference net.py:58-78)."""
    residual_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 step_emb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.residual_channels
        dt = precision.compute_dtype()
        step = nn.Dense(c, dtype=dt,
                        name="diffusion_projection")(step_emb)  # [B, C]
        y = precision.cast(x) + step[:, None, :]
        y = nn.Conv(2 * c, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", dtype=dt,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="dilated_conv")(y)
        y = y + nn.Conv(2 * c, (1,), dtype=dt,
                        kernel_init=nn.initializers.kaiming_normal(),
                        name="conditioner_projection")(cond)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(2 * c, (1,), dtype=dt,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (precision.cast(x) + residual) / \
            jnp.asarray(math.sqrt(2.0), residual.dtype), skip


class DiffNet(nn.Module):
    """Mel denoiser: spec [B, T, M] + t [B] + cond [B, T, H] -> eps [B, T, M]
    (reference ``DiffNet``, net.py:81-130)."""
    in_dims: int = 80
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 4

    @nn.compact
    def __call__(self, spec: jnp.ndarray, t: jnp.ndarray,
                 cond: jnp.ndarray) -> jnp.ndarray:
        c = self.residual_channels
        dt = precision.compute_dtype()
        x = nn.Conv(c, (1,), dtype=dt,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="input_projection")(spec)
        x = jax.nn.relu(x)
        step_emb = DiffusionStepMLP(c, name="mlp")(t)
        skips = []
        for i in range(self.residual_layers):
            x, skip = ResidualBlock(
                c, 2 ** (i % self.dilation_cycle_length),
                name=f"residual_{i}")(x, cond, step_emb)
            skips.append(skip)
        x = sum(skips) / jnp.asarray(math.sqrt(self.residual_layers),
                                     skips[0].dtype)
        x = nn.Conv(c, (1,), dtype=dt,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.in_dims, (1,), kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)  # f32 eps head
        return x


class DDiffNet(nn.Module):
    """Joint continuous(f0)+categorical(uv) denoiser
    (reference ``DDiffNet``, net.py:215-266).

    f0: [B, T, in_dims], uv: int [B, T], t: [B], cond: [B, T, H],
    nonpadding: [B, T] -> [B, T, in_dims + num_classes].
    """
    in_dims: int = 1
    num_classes: int = 2
    residual_layers: int = 10
    residual_channels: int = 192
    dilation_cycle_length: int = 4

    @nn.compact
    def __call__(self, f0: jnp.ndarray, uv: jnp.ndarray, t: jnp.ndarray,
                 cond: jnp.ndarray, nonpadding: jnp.ndarray) -> jnp.ndarray:
        c = self.residual_channels
        dt = precision.compute_dtype()
        mask = precision.cast(nonpadding[..., None])
        xf = nn.Conv(c // 2, (1,), dtype=dt,
                     kernel_init=nn.initializers.kaiming_normal(),
                     name="input_projection")(f0)
        xu = precision.cast(
            nn.Embed(self.num_classes, c // 2, name="uv_embed")(uv))
        x = jnp.concatenate([xf, xu], axis=-1) * mask
        step_emb = DiffusionStepMLP(c, name="mlp")(t)
        skips = []
        for i in range(self.residual_layers):
            x, skip = ResidualBlock(
                c, 2 ** (i % self.dilation_cycle_length),
                name=f"residual_{i}")(x, cond, step_emb)
            skips.append(skip)
        x = sum(skips) / jnp.asarray(math.sqrt(self.residual_layers),
                                     skips[0].dtype)
        x = nn.Conv(c, (1,), dtype=dt,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.in_dims + self.num_classes, (1,),
                    kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)  # f32 eps+logits head
        return x * nonpadding[..., None]


class F0DiffNet(nn.Module):
    """Gaussian-only F0 denoiser (reference ``F0DiffNet``,
    modules/diff/net.py:133-180): continuous f0 channel only, no uv
    embedding — used with the legacy ``f0_gen: diff`` switch."""
    in_dims: int = 1
    residual_layers: int = 10
    residual_channels: int = 192
    dilation_cycle_length: int = 4

    @nn.compact
    def __call__(self, f0: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray,
                 nonpadding: jnp.ndarray) -> jnp.ndarray:
        c = self.residual_channels
        mask = nonpadding[..., None]
        x = nn.Conv(c, (1,), kernel_init=nn.initializers.kaiming_normal(),
                    name="input_projection")(f0) * mask
        x = jax.nn.relu(x)
        step_emb = DiffusionStepMLP(c, name="mlp")(t)
        skips = []
        for i in range(self.residual_layers):
            x, skip = ResidualBlock(
                c, 2 ** (i % self.dilation_cycle_length),
                name=f"residual_{i}")(x, cond, step_emb)
            skips.append(skip)
        x = sum(skips) / math.sqrt(self.residual_layers)
        x = nn.Conv(c, (1,), kernel_init=nn.initializers.kaiming_normal(),
                    name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.in_dims, (1,), kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)
        return x * mask


class MDiffNet(nn.Module):
    """Categorical-only uv denoiser (reference ``MDiffNet``,
    modules/diff/net.py:269-319): uv embedding input, class logits out."""
    num_classes: int = 2
    residual_layers: int = 10
    residual_channels: int = 192
    dilation_cycle_length: int = 4

    @nn.compact
    def __call__(self, uv: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray,
                 nonpadding: jnp.ndarray) -> jnp.ndarray:
        c = self.residual_channels
        mask = nonpadding[..., None]
        x = nn.Embed(self.num_classes, c, name="uv_embed")(uv) * mask
        step_emb = DiffusionStepMLP(c, name="mlp")(t)
        skips = []
        for i in range(self.residual_layers):
            x, skip = ResidualBlock(
                c, 2 ** (i % self.dilation_cycle_length),
                name=f"residual_{i}")(x, cond, step_emb)
            skips.append(skip)
        x = sum(skips) / math.sqrt(self.residual_layers)
        x = nn.Conv(c, (1,), kernel_init=nn.initializers.kaiming_normal(),
                    name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.num_classes, (1,),
                    kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)
        return x * mask

class FFTDenoiser(nn.Module):
    """Transformer (FFT-block) mel denoiser — the reference's alternative
    denoiser ``FFT`` (``modules/diff/candidate_decoder.py:35-95``): input
    1x1-conv to ``residual_channels``, sinusoidal diffusion-step MLP, a
    fused [x | cond | step] -> hidden projection, FastspeechDecoder FFT
    stack, and a mel head. Selected with ``diff_decoder_type: fft``.

    spec [B, T, M] + t [B] + cond [B, T, H] -> eps/x0 [B, T, M].
    """
    in_dims: int = 80
    hidden_size: int = 256
    residual_channels: int = 256
    num_layers: int = 4
    kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, spec: jnp.ndarray, t: jnp.ndarray,
                 cond: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        from stylesinger_tpu.models.common import FastspeechDecoder

        dim = self.residual_channels
        x = nn.Conv(dim, (1,), kernel_init=nn.initializers.kaiming_normal(),
                    name="input_projection")(spec)
        step = DiffusionStepMLP(dim, name="mlp")(t)  # [B, dim]
        step = jnp.broadcast_to(step[:, None, :],
                                (x.shape[0], x.shape[1], dim))
        h = nn.Dense(self.hidden_size, name="get_decode_inp")(
            jnp.concatenate([x, cond, step], axis=-1))
        # padding inferred from the (masked) conditioner, mirroring the
        # reference's x.abs().sum(-1)==0 rule
        nonpadding = (jnp.abs(cond).sum(-1) > 1e-8).astype(jnp.float32)
        h = FastspeechDecoder(
            self.hidden_size, self.num_layers, self.kernel_size,
            num_heads=self.num_heads, dropout=self.dropout,
            name="decoder")(h, nonpadding, deterministic=deterministic)
        return nn.Dense(self.in_dims, name="get_mel_out")(h)
