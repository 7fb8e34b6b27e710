"""Residual Style Adaptor: reference-mel style encoder + prosody alignment.

Behavioral parity targets (AaronZ345/StyleSinger):
- ``LocalStyleAdaptor`` (``modules/StyleSinger/lse.py:93-129``): ref mel ->
  4-layer WaveNet conditioner -> +broadcast ref F0 -> 5x ConvBlocks(80->H)
  -> residual-quantization bottleneck -> style tokens.  ``no_rq`` (warmup)
  returns the unquantized style.
- ``ProsodyAligner`` / ``CrossAttenLayer`` (``lse.py:16-81``): 2-layer
  post-norm cross-attention (content queries attend to style), diagonal
  guided-attention loss with sigma=0.3, and a hard monotonic band mask
  ("forcing") used before step 20000.
- ``_make_guided_attention_mask`` (``lse.py:83-91``).

TPU-native design: batch-first [B, T, C]; the forcing branch is a static
Python bool (separate compiled graphs per curriculum phase instead of traced
control flow); padding masks are threaded explicitly; the band mask is built
from broadcasted iotas (static shapes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from stylesinger_tpu.models.common import (
    ConvBlocks, MultiheadCrossAttention, WN,
)
from stylesinger_tpu.models.rq import RQBottleneck


def guided_attention_mask(tq: int, q_len: jnp.ndarray, tk: int,
                          k_len: jnp.ndarray,
                          sigma: float) -> jnp.ndarray:
    """[B, Tq, Tk] penalty mask ``1 - exp(-(y/k_len - x/q_len)^2 / 2s^2)``.

    Lengths are clamped to >= 1: all-padding batch rows (static-shape
    batch padding, data/batching.py::collate_batch) have length 0 and
    would otherwise emit 0/0 = NaN, which survives the later pair-mask
    multiply (NaN * 0 = NaN) and poisons the guided loss."""
    gx = jnp.arange(tq)[None, :, None].astype(jnp.float32)
    gy = jnp.arange(tk)[None, None, :].astype(jnp.float32)
    ql = jnp.maximum(q_len[:, None, None].astype(jnp.float32), 1.0)
    kl = jnp.maximum(k_len[:, None, None].astype(jnp.float32), 1.0)
    return 1.0 - jnp.exp(-((gy / kl - gx / ql) ** 2) / (2 * sigma ** 2))


def monotonic_band_attention(tq: int, tk: int) -> jnp.ndarray:
    """The reference's forcing-mode hard band: query i sums kv frames j with
    ``floor(i*k)-1 <= j < ceil(i*k)+1`` where ``k = Tk/Tq`` (lse.py:30-40).

    Returns an *unnormalized* 0/1 matrix [Tq, Tk] (the reference multiplies
    by it directly, without softmax normalization).
    """
    k = tk / tq
    i = jnp.arange(tq)[:, None].astype(jnp.float32)
    j = jnp.arange(tk)[None, :].astype(jnp.float32)
    upper = jnp.ceil(i * k) + 1
    lower = jnp.floor(i * k) - 1
    return ((j < upper) & (j >= lower)).astype(jnp.float32)


class CrossAttenLayer(nn.Module):
    """Post-norm cross-attention + ReLU FFN (reference lse.py:16-47)."""
    hidden_size: int
    num_heads: int = 2
    ffn_dim: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src: jnp.ndarray, style: jnp.ndarray,
                 style_nonpadding: jnp.ndarray, forcing: bool = False,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, tq, c = src.shape
        tk = style.shape[1]
        if forcing:
            attn = jnp.broadcast_to(monotonic_band_attention(tq, tk)[None],
                                    (b, tq, tk))
            src2 = jnp.einsum("bqk,bkc->bqc", attn, style,
                              preferred_element_type=jnp.float32)
        else:
            src2, attn = MultiheadCrossAttention(
                self.num_heads, dropout=self.dropout, name="mha")(
                src, style, style_nonpadding, deterministic)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src)
        y = nn.Dense(self.ffn_dim, name="linear1")(src)
        y = jax.nn.relu(y)
        y = nn.Dense(self.hidden_size, name="linear2")(y)
        src = src + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        src = nn.LayerNorm(name="norm2")(src)
        return src, attn


class ProsodyAligner(nn.Module):
    """Stack of cross-attention layers with guided-attention loss
    (reference lse.py:50-81)."""
    hidden_size: int
    num_layers: int = 2
    num_heads: int = 2
    ffn_dim: int = 2048
    guided_sigma: float = 0.3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src: jnp.ndarray, style: jnp.ndarray,
                 src_nonpadding: jnp.ndarray, style_nonpadding: jnp.ndarray,
                 forcing: bool = False, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (aligned [B,Tq,H], guided_loss scalar, attn [B,L,Tq,Tk])."""
        b, tq, _ = src.shape
        tk = style.shape[1]
        q_len = src_nonpadding.sum(-1)
        k_len = style_nonpadding.sum(-1)
        guided_mask = guided_attention_mask(
            tq, q_len, tk, k_len, self.guided_sigma)
        pair_mask = (src_nonpadding[:, :, None] *
                     style_nonpadding[:, None, :])

        output = src
        guided_loss = 0.0
        attns = []
        for i in range(self.num_layers):
            output, attn = CrossAttenLayer(
                self.hidden_size, self.num_heads, self.ffn_dim, self.dropout,
                name=f"layer_{i}")(output, style, style_nonpadding,
                                   forcing=forcing,
                                   deterministic=deterministic)
            attns.append(attn)
            g = attn * guided_mask
            guided_loss = guided_loss + \
                (g * pair_mask).sum() / jnp.maximum(pair_mask.sum(), 1.0)
        return output, guided_loss, jnp.stack(attns, axis=1)


class LocalStyleAdaptor(nn.Module):
    """Reference-mel -> frame-level style tokens via WN + ConvBlocks + RQ
    (reference lse.py:93-129)."""
    hidden_size: int
    n_codes: int = 128
    rq_depth: int = 4
    rq_decay: float = 0.99
    vae_dropout: float = 0.0
    mel_bins: int = 80
    wn_layers: int = 4
    conv_dilations: Tuple[int, ...] = (1, 1, 1, 1, 1)

    @nn.compact
    def __call__(self, ref_mels: jnp.ndarray,
                 ref_f0: Optional[jnp.ndarray] = None,
                 mel2ph: Optional[jnp.ndarray] = None,
                 use_rq: bool = True, train: bool = False,
                 rng: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """ref_mels: [B, T, 80]; ref_f0: [B, T] (normed, interpolated);
        mel2ph (optional): pool the style to phone level before encoding
        (the reference's ``group_hidden_by_segs`` branch, lse.py:112-119).

        Returns (style [B, T(or T_ph), H], rq_loss scalar or None,
        codes or None).
        """
        nonpadding = (jnp.abs(ref_mels[:, :, 0]) > 1e-8).astype(jnp.float32)
        h = WN(hidden_channels=self.mel_bins, kernel_size=3, dilation_rate=1,
               n_layers=self.wn_layers,
               name="wavenet")(ref_mels, nonpadding,
                               deterministic=deterministic)
        if mel2ph is not None:
            from stylesinger_tpu.dsp.align import group_hidden_by_segs
            t_ph = int(mel2ph.shape[1])  # static upper bound on segments
            h, cnt = group_hidden_by_segs(h, mel2ph, t_ph)
            if ref_f0 is not None:
                f0_ph, _ = group_hidden_by_segs(
                    ref_f0[..., None], mel2ph, t_ph)
                h = h + f0_ph
            nonpadding = (cnt > 0).astype(jnp.float32)
        elif ref_f0 is not None:
            # broadcast the scalar f0 track over all mel channels (the
            # reference repeats it to 80 channels and adds)
            h = h + ref_f0[..., None]
        style = ConvBlocks(self.mel_bins, self.hidden_size,
                           dilations=tuple(self.conv_dilations),
                           kernel_size=5, dropout=self.vae_dropout,
                           name="encoder")(h, nonpadding,
                                           deterministic=deterministic)
        if not use_rq:
            return style, None, None
        # EMA codebook statistics are numerically touchy — quantize in f32
        # even under a bf16 activation context
        style = style.astype(jnp.float32)
        quant, rq_loss, codes = RQBottleneck(
            self.n_codes, self.hidden_size, rq_depth=self.rq_depth,
            decay=self.rq_decay, name="rq")(style, train=train, rng=rng,
                                            nonpadding=nonpadding)
        return quant, rq_loss, codes
