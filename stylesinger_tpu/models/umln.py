"""Uncertainty-Modeling Layer Normalization (UMLN).

Behavioral parity target: ``DistributionUncertainty``
(``modules/StyleSinger/umln.py:48-72`` in AaronZ345/StyleSinger): normalize
the content over the hidden dim, then re-scale/shift with gain/bias derived
from the speaker(+emotion) embedding, where the gain/bias are perturbed by
Gaussian noise whose scale is the *cross-batch* std of the affine outputs
("distribution uncertainty").  Active only in training, with probability
``p`` per step (a single coin for the whole batch, as in the reference).

TPU-native design notes: all randomness comes from the flax ``'umln'`` PRNG
stream, the train/eval switch is a static Python bool (two compiled graphs,
no traced branching), and the whole op is elementwise so XLA fuses it into
the surrounding matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class UMLN(nn.Module):
    hidden_size: int
    p: float = 0.5
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, style_embed: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """x: [B, T, H]; style_embed: [B, 1, H] (spk [+ emo] projection)."""
        affine = nn.Dense(2 * self.hidden_size,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="affine")
        if not train:
            # the reference returns the input untouched at eval; the affine
            # layer still exists in the checkpoint
            _ = affine(style_embed)
            return x

        rng = self.make_rng("umln")
        rng_coin, rng_beta, rng_gamma = jax.random.split(rng, 3)

        mu = jnp.mean(x, axis=-1, keepdims=True)
        # torch.std defaults to the unbiased estimator (ddof=1) — matching
        # it matters for exact train-mode parity
        sig = jnp.std(x, axis=-1, keepdims=True, ddof=1)
        x_normed = (x - mu) / (sig + self.eps)

        stats = affine(style_embed)                     # [B, 1, 2H]
        mu1, sig1 = jnp.split(stats, 2, axis=-1)        # gain/bias seeds

        def batch_std(v: jnp.ndarray) -> jnp.ndarray:
            if v.shape[0] == 1:
                return jnp.zeros_like(v)
            s = jnp.std(v, axis=0, keepdims=True, ddof=1) + self.eps
            return jnp.broadcast_to(s, v.shape)

        beta = mu1 + jax.random.normal(rng_beta, mu1.shape) * batch_std(mu1)
        gamma = sig1 + jax.random.normal(rng_gamma, sig1.shape) * batch_std(sig1)

        out = gamma * x_normed + beta
        # one coin per step for the whole batch (reference uses
        # ``random.random() > p`` at the Python level)
        apply = jax.random.bernoulli(rng_coin, self.p)
        return jnp.where(apply, out, x)
