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
        emb = timestep_embedding(t, self.dim)
        emb = nn.Dense(self.dim * 4, name="fc1")(emb)
        emb = mish(emb)
        emb = nn.Dense(self.dim, name="fc2")(emb)
        return emb


class ResidualBlock(nn.Module):
    """Gated dilated-conv residual block (reference net.py:58-78)."""
    residual_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 step_emb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.residual_channels
        step = nn.Dense(c, name="diffusion_projection")(step_emb)  # [B, C]
        y = x + step[:, None, :]
        y = nn.Conv(2 * c, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME",
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="dilated_conv")(y)
        y = y + nn.Conv(2 * c, (1,),
                        kernel_init=nn.initializers.kaiming_normal(),
                        name="conditioner_projection")(cond)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(2 * c, (1,),
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


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
        x = nn.Conv(c, (1,), kernel_init=nn.initializers.kaiming_normal(),
                    name="input_projection")(spec)
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
        mask = nonpadding[..., None]
        xf = nn.Conv(c // 2, (1,),
                     kernel_init=nn.initializers.kaiming_normal(),
                     name="input_projection")(f0)
        xu = nn.Embed(self.num_classes, c // 2, name="uv_embed")(uv)
        x = jnp.concatenate([xf, xu], axis=-1) * mask
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
        x = nn.Conv(self.in_dims + self.num_classes, (1,),
                    kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)
        return x * mask


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
