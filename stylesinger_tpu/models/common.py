"""Shared neural building blocks (flax.linen, batch-first, masked).

Re-designed equivalents of the reference's fairseq-era layers
(``modules/commons/common_layers.py``, ``modules/fastspeech/tts_modules.py``):

- ``EncSALayer``: pre-LN self-attention + pre-LN conv-FFN (kernel 9, gelu,
  ``k**-0.5`` scaling) with post-residual masking,
- ``FFTBlocks`` / ``FastspeechEncoder`` / ``FastspeechDecoder``,
- ``DurationPredictor`` (conv k3 -> relu -> LN -> dropout, log-domain MSE),
- ``PitchPredictor`` (5x conv k5, learnable-alpha positional embedding),
- ``length_regulator``: cumsum/token-mask durations -> ``mel2ph`` with a
  *static* output length (TPU requirement; the reference emits dynamic T).

Dropout everywhere uses flax's 'dropout' PRNG collection; pass
``deterministic=True`` for eval/inference.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.models import precision


def sinusoidal_table(n_positions: int, dim: int,
                     padding_idx: Optional[int] = 0) -> np.ndarray:
    """fairseq/tensor2tensor sinusoidal table: [sin | cos] concatenated."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = np.exp(np.arange(half, dtype=np.float64) * -emb)
    emb = np.arange(n_positions, dtype=np.float64)[:, None] * emb[None, :]
    table = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_positions, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx] = 0
    return table.astype(np.float32)


def positions_from_mask(nonpadding: jnp.ndarray,
                        padding_idx: int = 0) -> jnp.ndarray:
    """fairseq ``make_positions``: position = padding_idx + cumulative count
    of non-pad steps; pad steps get padding_idx (whose table row is zero)."""
    pos = jnp.cumsum(nonpadding.astype(jnp.int32), axis=-1) * \
        nonpadding.astype(jnp.int32) + padding_idx
    return pos


class SinusoidalPositionalEmbedding(nn.Module):
    """Non-learned positional embedding addressed by a nonpadding mask."""
    dim: int
    max_positions: int = 4096
    padding_idx: int = 0

    @nn.compact
    def __call__(self, nonpadding: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(sinusoidal_table(
            self.max_positions + self.padding_idx + 1, self.dim,
            self.padding_idx))
        pos = positions_from_mask(nonpadding, self.padding_idx)
        return table[pos]


class Embedding(nn.Module):
    """Token embedding with a zeroed padding row and N(0, d^-0.5) init."""
    num_embeddings: int
    features: int
    padding_idx: Optional[int] = 0

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        emb = self.param(
            "embedding",
            nn.initializers.normal(stddev=self.features ** -0.5),
            (self.num_embeddings, self.features))
        if self.padding_idx is not None:
            emb = jnp.asarray(emb).at[self.padding_idx].set(0.0)
        return emb[ids]


class LambdaDense(nn.Module):
    """Dense with xavier-uniform init (reference ``Linear`` helper)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias,
                        dtype=precision.compute_dtype(),
                        kernel_init=nn.initializers.xavier_uniform())(x)


class MultiheadSelfAttention(nn.Module):
    """Scaled-dot self-attention, no bias (reference MHA has bias=False)."""
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_padding_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        b, t, c = x.shape
        h = self.num_heads
        d = c // h
        dt = precision.compute_dtype()
        qkv = nn.Dense(3 * c, use_bias=False, dtype=dt,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            return a.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(d)
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(key_padding_mask[:, None, None, :] > 0, logits, neg)
        probs = jax.nn.softmax(logits, axis=-1)  # f32 reduction
        if self.dropout > 0:
            probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", precision.cast(probs), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, use_bias=False, dtype=dt,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="out")(out)


class MultiheadCrossAttention(nn.Module):
    """Cross-attention (queries attend to memory) returning attn weights."""
    num_heads: int
    dropout: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, q_in: jnp.ndarray, kv_in: jnp.ndarray,
                 kv_nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, tq, c = q_in.shape
        tk = kv_in.shape[1]
        h = self.num_heads
        d = c // h
        init = nn.initializers.xavier_uniform()
        q = nn.Dense(c, use_bias=self.use_bias, kernel_init=init, name="q")(q_in)
        k = nn.Dense(c, use_bias=self.use_bias, kernel_init=init, name="k")(kv_in)
        v = nn.Dense(c, use_bias=self.use_bias, kernel_init=init, name="v")(kv_in)
        q = q.reshape(b, tq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(d)
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(kv_nonpadding[:, None, None, :] > 0, logits, neg)
        probs = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0:
            probs_d = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        else:
            probs_d = probs
        out = jnp.einsum("bhqk,bhkd->bhqd", probs_d, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, c)
        out = nn.Dense(c, use_bias=self.use_bias, kernel_init=init,
                       name="out")(out)
        # torch nn.MultiheadAttention returns head-averaged weights
        return out, probs.mean(axis=1)


class TransformerFFN(nn.Module):
    """conv1d(k) -> * k**-0.5 -> act -> dropout -> dense (reference
    ``TransformerFFNLayer``, common_layers.py:541-580)."""
    hidden_size: int
    filter_size: int
    kernel_size: int = 9
    dropout: float = 0.0
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        dt = precision.compute_dtype()
        y = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME",
                    dtype=dt)(x)
        y = y * jnp.asarray(self.kernel_size ** -0.5, y.dtype)
        if self.act == "gelu":
            y = jax.nn.gelu(y)
        elif self.act == "relu":
            y = jax.nn.relu(y)
        elif self.act == "swish":
            y = jax.nn.silu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = LambdaDense(self.hidden_size)(y)
        return y


class EncSALayer(nn.Module):
    """Pre-LN self-attention block + pre-LN conv-FFN block, masked outputs
    (reference ``EncSALayer``, common_layers.py:624-673)."""
    hidden_size: int
    num_heads: int
    dropout: float
    kernel_size: int = 9
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        dt = precision.compute_dtype()
        mask = precision.cast(nonpadding[..., None])
        x = precision.cast(x)
        if self.num_heads > 0:
            res = x
            y = nn.LayerNorm(dtype=dt)(x)
            y = MultiheadSelfAttention(self.num_heads, dropout=0.0)(
                y, nonpadding, deterministic)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = (res + y) * mask
        res = x
        y = nn.LayerNorm(dtype=dt)(x)
        y = TransformerFFN(self.hidden_size, 4 * self.hidden_size,
                           self.kernel_size, dropout=self.dropout,
                           act=self.act)(y, deterministic)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = (res + y) * mask
        return x


class FFTBlocks(nn.Module):
    """Stack of EncSALayers with optional positional embedding + final LN
    (reference ``FFTBlocks``, tts_modules.py:250-306)."""
    hidden_size: int
    num_layers: int
    kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1
    use_pos_embed: bool = True
    use_last_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        if self.use_pos_embed:
            alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
            pos = SinusoidalPositionalEmbedding(self.hidden_size)(nonpadding)
            x = x + alpha * pos
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = precision.cast(x)
        mask = precision.cast(nonpadding[..., None])
        x = x * mask
        for i in range(self.num_layers):
            x = EncSALayer(self.hidden_size, self.num_heads, self.dropout,
                           self.kernel_size, name=f"layer_{i}")(
                x, nonpadding, deterministic) * mask
        if self.use_last_norm:
            x = nn.LayerNorm(dtype=precision.compute_dtype())(x) * mask
        return x


def espnet_rel_pos_table(n_positions: int, dim: int) -> np.ndarray:
    """ESPnet ``RelPositionalEncoding`` table (reversed index order;
    reference modules/commons/espnet_positional_embedding.py:89-112)."""
    pos = np.arange(n_positions - 1, -1, -1.0)[:, None]
    div = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    table = np.zeros((n_positions, dim), np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table


class FastspeechEncoder(nn.Module):
    """Phone embedding (* sqrt(d)) + positions + FFT stack
    (reference tts_modules.py:309-346).  ``rel_pos`` swaps the fairseq
    mask-based positions for the ESPnet scaled encoding
    (tts_modules.py:319-320)."""
    vocab_size: int
    hidden_size: int
    num_layers: int
    kernel_size: int
    num_heads: int = 2
    dropout: float = 0.1
    rel_pos: bool = False

    @nn.compact
    def __call__(self, txt_tokens: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        nonpadding = (txt_tokens > 0).astype(jnp.float32)
        x = Embedding(self.vocab_size, self.hidden_size,
                      name="embed_tokens")(txt_tokens)
        x = x * math.sqrt(self.hidden_size)
        if self.rel_pos:
            table = jnp.asarray(espnet_rel_pos_table(4096,
                                                     self.hidden_size))
            x = x + table[None, -x.shape[1]:]
        else:
            x = x + SinusoidalPositionalEmbedding(
                self.hidden_size)(nonpadding)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = FFTBlocks(self.hidden_size, self.num_layers, self.kernel_size,
                      self.num_heads, self.dropout, use_pos_embed=False,
                      name="blocks")(x, nonpadding, deterministic)
        return x


class FastspeechDecoder(nn.Module):
    hidden_size: int
    num_layers: int
    kernel_size: int
    num_heads: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        return FFTBlocks(self.hidden_size, self.num_layers, self.kernel_size,
                         self.num_heads, self.dropout, use_pos_embed=True,
                         name="blocks")(x, nonpadding, deterministic)


class DurationPredictor(nn.Module):
    """n x (conv k3 -> relu -> LN -> dropout) -> dense(1); log-domain output
    (reference tts_modules.py:58-150)."""
    hidden_size: int
    n_layers: int = 2
    kernel_size: int = 3
    dropout: float = 0.5
    offset: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        dt = precision.compute_dtype()
        mask = precision.cast(nonpadding[..., None])
        for i in range(self.n_layers):
            x = nn.Conv(self.hidden_size, (self.kernel_size,),
                        padding="SAME", dtype=dt, name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(dtype=dt, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = x * mask
        x = nn.Dense(1, name="out")(x)  # head stays f32 (log-dur output)
        return (x * nonpadding[..., None])[..., 0]  # [B, T] log(dur + offset)

    @staticmethod
    def out2dur(log_dur: jnp.ndarray, offset: float = 1.0) -> jnp.ndarray:
        return jnp.maximum(
            jnp.round(jnp.exp(log_dur) - offset), 0.0).astype(jnp.int32)


class PitchPredictor(nn.Module):
    """5 x (conv k5 -> relu -> LN -> dropout) -> dense(odim), with learnable
    alpha-scaled positional embedding (reference tts_modules.py:191-234)."""
    hidden_size: int
    odim: int = 2
    n_layers: int = 5
    kernel_size: int = 5
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        dt = precision.compute_dtype()
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
        pos = SinusoidalPositionalEmbedding(x.shape[-1], max_positions=4096)(
            nonpadding)
        x = precision.cast(x + alpha * pos)
        for i in range(self.n_layers):
            x = nn.Conv(self.hidden_size, (self.kernel_size,),
                        padding="SAME", dtype=dt, name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(dtype=dt, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.odim, name="out")(x)  # f32 head


def length_regulator(dur: jnp.ndarray, dur_padding: jnp.ndarray,
                     max_frames: int, alpha: float = 1.0) -> jnp.ndarray:
    """Durations [B, T_txt] -> ``mel2ph`` [B, max_frames] (1-based, 0=pad).

    The cumsum/token-mask construction of the reference LengthRegulator
    (tts_modules.py:153-188) with a **static** output length: frames beyond
    the total duration stay 0.
    """
    dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    dur = dur * (1 - dur_padding.astype(jnp.int32))
    token_idx = jnp.arange(1, dur.shape[1] + 1)[None, :, None]
    dur_cumsum = jnp.cumsum(dur, axis=1)
    dur_cumsum_prev = jnp.pad(dur_cumsum, ((0, 0), (1, 0)))[:, :-1]
    pos_idx = jnp.arange(max_frames)[None, None]
    token_mask = (pos_idx >= dur_cumsum_prev[:, :, None]) & \
                 (pos_idx < dur_cumsum[:, :, None])
    mel2ph = (token_idx * token_mask.astype(jnp.int32)).sum(axis=1)
    return mel2ph


class ConvBlocksResidual(nn.Module):
    """One residual block: n x (LN -> conv(k,d) -> *k**-0.5 -> gelu -> conv1)
    (reference ``ResidualBlock`` in modules/StyleSinger/lse.py:159-200)."""
    channels: int
    kernel_size: int
    dilation: int
    n: int = 2
    c_multiple: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        dt = precision.compute_dtype()
        mask = precision.cast(nonpadding[..., None])
        x = precision.cast(x)
        for i in range(self.n):
            y = nn.LayerNorm(dtype=dt, name=f"ln_{i}")(x)
            y = nn.Conv(self.c_multiple * self.channels, (self.kernel_size,),
                        kernel_dilation=(self.dilation,), padding="SAME",
                        dtype=dt,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"conv_a_{i}")(y)
            y = y * jnp.asarray(self.kernel_size ** -0.5, y.dtype)
            y = jax.nn.gelu(y)
            y = nn.Conv(self.channels, (1,), dtype=dt,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"conv_b_{i}")(y)
            if self.dropout > 0:
                y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = (x + y) * mask
        return x


class ConvBlocks(nn.Module):
    """Stack of residual conv blocks + LN + postnet conv
    (reference ``ConvBlocks``, lse.py:203-240)."""
    channels: int
    out_dims: int
    dilations: Tuple[int, ...] = (1, 1, 1, 1, 1)
    kernel_size: int = 5
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        dt = precision.compute_dtype()
        mask = precision.cast(nonpadding[..., None])
        for i, d in enumerate(self.dilations):
            x = ConvBlocksResidual(self.channels, self.kernel_size, d,
                                   dropout=self.dropout,
                                   name=f"res_{i}")(x, nonpadding,
                                                    deterministic)
        x = x * mask
        x = nn.LayerNorm(dtype=dt, name="last_norm")(x) * mask
        x = nn.Conv(self.out_dims, (3,), padding="SAME", dtype=dt,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="post")(x) * mask
        return x


class WN(nn.Module):
    """Non-causal WaveNet conditioner: dilated conv -> gated tanh*sigmoid ->
    res/skip 1x1 (reference ``modules/StyleSinger/wavenet.py:14-88``).

    Operates batch-first [B, T, C]. The reference wraps convs in
    weight_norm; here convs are plain (weight norm is an optimization-time
    reparameterization — for inference-parity checkpoints the norm is folded
    anyway, mirroring ``remove_weight_norm``).
    """
    hidden_channels: int
    kernel_size: int = 3
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, nonpadding: jnp.ndarray,
                 g: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        dt = precision.compute_dtype()
        mask = precision.cast(nonpadding[..., None])
        x = precision.cast(x)
        output = jnp.zeros_like(x)
        hc = self.hidden_channels
        if g is not None:
            g = nn.Conv(2 * hc * self.n_layers, (1,), dtype=dt,
                        name="cond")(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i if self.dilation_rate > 1 else 1
            x_in = nn.Conv(2 * hc, (self.kernel_size,),
                           kernel_dilation=(dilation,), padding="SAME",
                           dtype=dt, name=f"in_{i}")(x)
            if self.p_dropout > 0:
                x_in = nn.Dropout(self.p_dropout)(x_in,
                                                  deterministic=deterministic)
            if g is not None:
                g_l = g[..., i * 2 * hc:(i + 1) * 2 * hc]
                x_in = x_in + g_l
            acts = jnp.tanh(x_in[..., :hc]) * jax.nn.sigmoid(x_in[..., hc:])
            res_skip_ch = 2 * hc if i < self.n_layers - 1 else hc
            rs = nn.Conv(res_skip_ch, (1,), dtype=dt,
                         name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + rs[..., :hc]) * mask
                output = output + rs[..., hc:]
            else:
                output = output + rs
        return output * mask
