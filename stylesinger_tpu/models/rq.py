"""Residual quantization bottleneck with EMA codebooks.

Parity target: ``RQBottleneck`` / ``VQEmbedding``
(``modules/StyleSinger/RQ.py:10-284``): depth-4 residual VQ, 128 codes of
dim=hidden, EMA decay 0.99 with unused-code restart, cumulative-sum
commitment loss, straight-through estimator.

TPU-native state design: codebooks and their EMA statistics live in a
mutable flax collection ``"codebook"`` updated inside the train step.  The
reference needs explicit ``dist.all_reduce`` of cluster stats and a
``dist.broadcast`` of restart vectors (RQ.py:86-100); under ``jit`` over a
sharded mesh the stat reductions are *global* reductions XLA lowers to ICI
collectives automatically, and restart randomness comes from a shared PRNG
key, so no hand-written communication is needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class VQEmbedding(nn.Module):
    """One EMA-updated codebook."""
    n_embed: int
    embed_dim: int
    decay: float = 0.99
    eps: float = 1e-5
    restart_unused_codes: bool = True

    def setup(self):
        init = nn.initializers.normal(stddev=1.0)
        self.embedding = self.variable(
            "codebook", "embedding",
            lambda: init(self.make_rng("params"), (self.n_embed, self.embed_dim)))
        self.cluster_size_ema = self.variable(
            "codebook", "cluster_size_ema",
            lambda: jnp.zeros((self.n_embed,)))
        # `+ 0` forces a distinct buffer: donating a TrainState that holds
        # the same array in two leaves trips "donate the same buffer twice"
        self.embed_ema = self.variable(
            "codebook", "embed_ema", lambda: self.embedding.value + 0)

    def find_nearest(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Argmin_k ||x - e_k||^2 via the expanded-quadratic form (one MXU
        matmul instead of a [N, K, D] broadcast)."""
        flat = inputs.reshape(-1, self.embed_dim)
        codebook = self.embedding.value
        x_sq = (flat ** 2).sum(-1, keepdims=True)
        e_sq = (codebook ** 2).sum(-1)[None, :]
        dist = x_sq + e_sq - 2.0 * flat @ codebook.T
        idx = jnp.argmin(dist, axis=-1)
        return idx.reshape(inputs.shape[:-1])

    def _update(self, vectors: jnp.ndarray, idxs: jnp.ndarray,
                rng: jax.Array, mask: Optional[jnp.ndarray] = None) -> None:
        """EMA buffer update + unused-code restart (RQ.py:66-115).

        ``mask`` [same leading shape as idxs]: 1 for real frames. Padded
        frames (static-shape batch padding) are all-zero vectors — without
        the mask they accumulate into cluster statistics and can be picked
        as restart codes (the reference has no batch padding, so it has no
        analogue of this)."""
        flat = vectors.reshape(-1, self.embed_dim)
        flat_idx = idxs.reshape(-1)
        n_vectors = flat.shape[0]
        w = jnp.ones((n_vectors, 1), flat.dtype) if mask is None else \
            mask.reshape(-1, 1).astype(flat.dtype)

        one_hot = jax.nn.one_hot(flat_idx, self.n_embed, dtype=flat.dtype)
        one_hot = one_hot * w
        cluster_size = one_hot.sum(0)                       # [K]
        vectors_sum = one_hot.T @ flat                      # [K, D]

        d = self.decay
        cluster_ema = self.cluster_size_ema.value * d + cluster_size * (1 - d)
        embed_ema = self.embed_ema.value * d + vectors_sum * (1 - d)

        if self.restart_unused_codes:
            n_rep = -(-self.n_embed // n_vectors)  # ceil
            tiled = jnp.tile(flat, (n_rep, 1))
            w_tiled = jnp.tile(w[:, 0], (n_rep,))
            rng_noise, rng_perm = jax.random.split(rng)
            tiled = tiled + jax.random.uniform(
                rng_noise, tiled.shape) * (0.01 / jnp.sqrt(float(self.embed_dim)))
            # random order, but real (mask=1) vectors always ahead of padded
            # ones: score = mask + U[0,1) and sort descending
            score = w_tiled + jax.random.uniform(rng_perm, w_tiled.shape)
            order = jnp.argsort(-score)
            rand_vecs = tiled[order][: self.n_embed]
            usage = (cluster_ema.reshape(-1, 1) >= 1).astype(flat.dtype)
            embed_ema = embed_ema * usage + rand_vecs * (1 - usage)
            cluster_ema = (cluster_ema * usage[:, 0] + (1 - usage[:, 0]))

        self.cluster_size_ema.value = cluster_ema
        self.embed_ema.value = embed_ema
        n = cluster_ema.sum()
        normalized = n * (cluster_ema + self.eps) / (n + self.n_embed * self.eps)
        self.embedding.value = embed_ema / normalized.reshape(-1, 1)

    def __call__(self, inputs: jnp.ndarray, train: bool = False,
                 rng: Optional[jax.Array] = None,
                 mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        idxs = jax.lax.stop_gradient(self.find_nearest(
            jax.lax.stop_gradient(inputs)))
        if train and not self.is_initializing():
            self._update(jax.lax.stop_gradient(inputs), idxs, rng, mask)
        embeds = self.embedding.value[idxs]
        return jax.lax.stop_gradient(embeds), idxs


class RQBottleneck(nn.Module):
    """Depth-D residual quantizer (RQ.py:135-284)."""
    n_embed: int
    embed_dim: int
    rq_depth: int = 4
    decay: float = 0.99

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 rng: Optional[jax.Array] = None,
                 nonpadding: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [B, T, D] -> (quantized straight-through, commitment loss,
        codes [B, T, depth]). ``nonpadding`` [B, T] excludes padded frames
        from the EMA statistics, restarts, and the commitment loss."""
        residual = jax.lax.stop_gradient(x)
        aggregated = jnp.zeros_like(x)
        quant_list = []
        codes = []
        for i in range(self.rq_depth):
            rng_i = None
            if rng is not None:
                rng, rng_i = jax.random.split(rng)
            quant, code = VQEmbedding(
                self.n_embed, self.embed_dim, decay=self.decay,
                name=f"codebook_{i}")(residual, train=train, rng=rng_i,
                                      mask=nonpadding)
            residual = residual - quant
            aggregated = aggregated + quant
            quant_list.append(aggregated)
            codes.append(code)

        # cumulative commitment loss (RQ.py:272-284), masked mean
        if nonpadding is None:
            commit = jnp.stack([
                ((x - jax.lax.stop_gradient(q)) ** 2).mean()
                for q in quant_list]).mean()
        else:
            m = nonpadding[..., None]
            denom = jnp.maximum(m.sum() * x.shape[-1], 1.0)
            commit = jnp.stack([
                (((x - jax.lax.stop_gradient(q)) ** 2) * m).sum() / denom
                for q in quant_list]).mean()

        quants = x + jax.lax.stop_gradient(quant_list[-1] - x)
        return quants, commit, jnp.stack(codes, axis=-1)
