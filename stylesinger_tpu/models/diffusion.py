"""Diffusion math: schedules, Gaussian + multinomial ops, scan samplers.

Parity targets:
- ``GaussianDiffusion`` / ``DiffusionDecoder`` (shallow mel diffusion,
  ``modules/diff/shallow_diffusion_tts.py:68-307``),
- ``GaussianMultinomialDiffusion`` (joint f0 + uv diffusion,
  ``modules/diff/gaussian_multinomial_diffusion.py:208-942``).

Design: all schedule buffers are precomputed numpy constants; the reference's
Python sampling loops (100 denoiser calls under ``tqdm``) become single
``lax.scan``s over stacked schedule slices, so the whole reverse process
compiles to one XLA while-loop with the WaveNet denoiser fused inside.
Samplers are *pure functions* taking a denoiser callable, which keeps them
independent of flax module plumbing (the model passes bound apply closures).

Log-space categorical ops use float32 with the reference's 1e-30/1e-40
epsilons (gmd.py:113-147).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Schedule
# ---------------------------------------------------------------------------

class Schedule(NamedTuple):
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    # multinomial (log-domain) buffers
    log_alpha: np.ndarray
    log_1_min_alpha: np.ndarray
    log_cumprod_alpha: np.ndarray
    log_1_min_cumprod_alpha: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)


def linear_beta_schedule(timesteps: int, max_beta: float) -> np.ndarray:
    """Reference linear schedule (shallow_diffusion_tts.py:41-46)."""
    return np.linspace(1e-4, max_beta, timesteps)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


def make_schedule(timesteps: int, max_beta: float,
                  schedule_type: str = "linear") -> Schedule:
    if schedule_type == "linear":
        betas = linear_beta_schedule(timesteps, max_beta)
    elif schedule_type == "cosine":
        betas = cosine_beta_schedule(timesteps)
    else:
        raise ValueError(schedule_type)
    betas = betas.astype(np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    log_alpha = np.log(alphas)
    log_cumprod_alpha = np.cumsum(log_alpha)

    def log_1_min_a(a):
        return np.log(1 - np.exp(a) + 1e-40)

    f32 = lambda x: x.astype(np.float32)  # noqa: E731
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(np.log(np.maximum(post_var, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
        log_alpha=f32(log_alpha),
        log_1_min_alpha=f32(log_1_min_a(log_alpha)),
        log_cumprod_alpha=f32(log_cumprod_alpha),
        log_1_min_cumprod_alpha=f32(log_1_min_a(log_cumprod_alpha)),
    )


def _extract(buf: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather schedule entries at t [B] and reshape to broadcast over ndim."""
    out = jnp.asarray(buf)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# Gaussian half
# ---------------------------------------------------------------------------

def gaussian_q_sample(sched: Schedule, x_start: jnp.ndarray, t: jnp.ndarray,
                      noise: jnp.ndarray) -> jnp.ndarray:
    return (_extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start +
            _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * noise)


def predict_start_from_noise(sched: Schedule, x_t: jnp.ndarray,
                             t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    return (_extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t -
            _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)


def q_posterior(sched: Schedule, x_start: jnp.ndarray, x_t: jnp.ndarray,
                t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mean = (_extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start +
            _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t)
    log_var = _extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, log_var


def gaussian_p_sample(sched: Schedule, x: jnp.ndarray, t: jnp.ndarray,
                      noise_pred: jnp.ndarray, rng: jax.Array,
                      clip: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = (-1.0, 1.0)
                      ) -> jnp.ndarray:
    """One reverse step x_t -> x_{t-1} with x0-clipping."""
    x_recon = predict_start_from_noise(sched, x, t, noise_pred)
    if clip is not None:
        x_recon = jnp.clip(x_recon, clip[0], clip[1])
    mean, log_var = q_posterior(sched, x_recon, x, t)
    noise = jax.random.normal(rng, x.shape, x.dtype)
    nonzero = (t > 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise


# ---------------------------------------------------------------------------
# Multinomial half (log-space, 2 classes for uv)
# ---------------------------------------------------------------------------

def index_to_log_onehot(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """int [B, T] -> log-onehot [B, K, T] (class axis at dim 1, as reference)."""
    oh = jax.nn.one_hot(x, num_classes, axis=1)
    return jnp.log(jnp.clip(oh, 1e-30, None))


def log_onehot_to_index(log_x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(log_x, axis=1)


def log_add_exp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    m = jnp.maximum(a, b)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def cat_q_pred_one_timestep(sched: Schedule, log_x_t: jnp.ndarray,
                            t: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    log_alpha_t = _extract(sched.log_alpha, t, log_x_t.ndim)
    log_1_min_alpha_t = _extract(sched.log_1_min_alpha, t, log_x_t.ndim)
    return log_add_exp(log_x_t + log_alpha_t,
                       log_1_min_alpha_t - np.log(num_classes))


def cat_q_pred(sched: Schedule, log_x_start: jnp.ndarray, t: jnp.ndarray,
               num_classes: int) -> jnp.ndarray:
    log_ca = _extract(sched.log_cumprod_alpha, t, log_x_start.ndim)
    log_1_min_ca = _extract(sched.log_1_min_cumprod_alpha, t, log_x_start.ndim)
    return log_add_exp(log_x_start + log_ca,
                       log_1_min_ca - np.log(num_classes))


def cat_q_posterior(sched: Schedule, log_x_start: jnp.ndarray,
                    log_x_t: jnp.ndarray, t: jnp.ndarray,
                    num_classes: int) -> jnp.ndarray:
    """q(x_{t-1} | x_t, x0-distribution) in log space (gmd.py:374-396)."""
    t_minus_1 = jnp.maximum(t - 1, 0)
    log_ev = cat_q_pred(sched, log_x_start, t_minus_1, num_classes)
    t_b = t.reshape((-1,) + (1,) * (log_x_start.ndim - 1))
    log_ev = jnp.where(t_b == 0, log_x_start, log_ev)
    unnormed = log_ev + cat_q_pred_one_timestep(sched, log_x_t, t, num_classes)
    return unnormed - jax.nn.logsumexp(unnormed, axis=1, keepdims=True)


def cat_p_pred(sched: Schedule, model_logits: jnp.ndarray,
               log_x_t: jnp.ndarray, t: jnp.ndarray,
               num_classes: int) -> jnp.ndarray:
    """x0-parameterization: softmax(model) -> q_posterior."""
    log_x_recon = jax.nn.log_softmax(model_logits, axis=1)
    return cat_q_posterior(sched, log_x_recon, log_x_t, t, num_classes)


def log_sample_categorical(rng: jax.Array, logits: jnp.ndarray,
                           num_classes: int) -> jnp.ndarray:
    """Gumbel-max sampling in log space (gmd.py:447-452)."""
    uniform = jax.random.uniform(rng, logits.shape)
    gumbel = -jnp.log(-jnp.log(uniform + 1e-30) + 1e-30)
    sample = jnp.argmax(gumbel + logits, axis=1)
    return index_to_log_onehot(sample, num_classes)


def multinomial_kl(log_p1: jnp.ndarray, log_p2: jnp.ndarray) -> jnp.ndarray:
    return (jnp.exp(log_p1) * (log_p1 - log_p2)).sum(axis=1)


def _masked_time_mean(x: jnp.ndarray, nonpadding: jnp.ndarray) -> jnp.ndarray:
    """sum over time of x*mask / sum mask, per batch (gmd.py:99-105)."""
    return (x * nonpadding).sum(-1) / jnp.maximum(nonpadding.sum(-1), 1e-8)


# ---------------------------------------------------------------------------
# Training losses
# ---------------------------------------------------------------------------

def gm_mixed_loss(denoise_fn: Callable, sched: Schedule, f0: jnp.ndarray,
                  uv: jnp.ndarray, cond: jnp.ndarray, nonpadding: jnp.ndarray,
                  rng: jax.Array, num_classes: int = 2
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joint training loss (gmd.py:583-625).

    f0: [B, T, 1] minmax-normed; uv: [B, T] float 0/1; cond: [B, T, H].
    denoise_fn(f0_t [B,T,1], uv_t int [B,T], t [B]) -> [B, T, 1+K].
    Returns (multinomial_loss, gaussian_loss) scalars.
    """
    b = f0.shape[0]
    T = sched.num_timesteps
    rng_t, rng_noise, rng_cat = jax.random.split(rng, 3)
    t = jax.random.randint(rng_t, (b,), 0, T)
    pt = jnp.full((b,), 1.0 / T)

    noise = jax.random.normal(rng_noise, f0.shape, f0.dtype)
    f0_t = gaussian_q_sample(sched, f0, t, noise)

    log_uv = index_to_log_onehot(uv.astype(jnp.int32), num_classes)  # [B,K,T]
    log_uv_t = log_sample_categorical(
        rng_cat, cat_q_pred(sched, log_uv, t, num_classes), num_classes)
    uv_t = log_onehot_to_index(log_uv_t)

    out = denoise_fn(f0_t, uv_t, t)          # [B, T, 1+K]
    eps_pred = out[..., :1]                  # [B, T, 1]
    uv_logits = jnp.swapaxes(out[..., 1:], 1, 2)  # [B, K, T]

    # multinomial variational bound (vb_stochastic)
    log_true = cat_q_posterior(sched, log_uv, log_uv_t, t, num_classes)
    log_model = cat_p_pred(sched, uv_logits, log_uv_t, t, num_classes)
    kl = _masked_time_mean(multinomial_kl(log_true, log_model), nonpadding)
    decoder_nll = -_masked_time_mean(
        (jnp.exp(log_uv) * log_model).sum(axis=1), nonpadding)
    at0 = (t == 0).astype(kl.dtype)
    lt = at0 * decoder_nll + (1 - at0) * kl

    log_qxT = cat_q_pred(sched, log_uv,
                         jnp.full((b,), T - 1, dtype=jnp.int32), num_classes)
    log_half = jnp.full_like(log_qxT, -np.log(num_classes))
    kl_prior = _masked_time_mean(multinomial_kl(log_qxT, log_half), nonpadding)
    loss_multi = (lt / pt + kl_prior).mean()

    # gaussian L1 on eps, masked to voiced nonpadding frames (gmd.py:294-296)
    mask = (nonpadding * (uv == 0).astype(nonpadding.dtype))[..., None]
    loss_gauss = (jnp.abs(noise - eps_pred) * mask).sum() / \
        jnp.maximum((mask + 1e-8).sum(), 1e-8)
    return loss_multi, loss_gauss


def shallow_p_losses(denoise_fn: Callable, sched: Schedule,
                     x_start: jnp.ndarray, cond: jnp.ndarray, rng: jax.Array,
                     K_step: int,
                     nonpadding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mel diffusion training loss (shallow_diffusion_tts.py:206-224,291-295).

    x_start: normed mel [B, T, M]; denoise_fn(x_t, t) -> eps.
    """
    b = x_start.shape[0]
    rng_t, rng_noise = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, K_step)
    noise = jax.random.normal(rng_noise, x_start.shape, x_start.dtype)
    x_t = gaussian_q_sample(sched, x_start, t, noise)
    eps_pred = denoise_fn(x_t, t)
    err = jnp.abs(noise - eps_pred)
    if nonpadding is not None:
        mask = nonpadding[..., None]
        return (err * mask).sum() / jnp.maximum(mask.sum() * x_start.shape[-1],
                                                1e-8)
    return err.mean()


# ---------------------------------------------------------------------------
# Samplers (lax.scan; ~100 denoiser calls compiled into one loop)
# ---------------------------------------------------------------------------

def _gaussian_ddim_jump(sched: Schedule, x: jnp.ndarray, t: jnp.ndarray,
                        t_prev: jnp.ndarray, eps_pred: jnp.ndarray,
                        clip: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """Deterministic DDIM (eta=0) jump t -> t_prev (t_prev < 0 lands on x0),
    with the same x0 clipping as the ancestral sampler."""
    x0 = predict_start_from_noise(sched, x, t, eps_pred)
    x0 = jnp.clip(x0, clip[0], clip[1])
    # eps implied by the clipped x0 (keeps the jump consistent with clip)
    sr = _extract(sched.sqrt_recip_alphas_cumprod, t, x.ndim)
    srm1 = _extract(sched.sqrt_recipm1_alphas_cumprod, t, x.ndim)
    eps = (sr * x - x0) / srm1
    tp = jnp.maximum(t_prev, 0)
    ac_prev = _extract(sched.alphas_cumprod, tp, x.ndim)
    ac_prev = jnp.where(
        t_prev.reshape((-1,) + (1,) * (x.ndim - 1)) < 0, 1.0, ac_prev)
    return jnp.sqrt(ac_prev) * x0 + jnp.sqrt(1.0 - ac_prev) * eps


def _log1mexp(a: jnp.ndarray) -> jnp.ndarray:
    """log(1 - exp(a)) for a <= 0, safe at a -> 0."""
    return jnp.log(jnp.clip(-jnp.expm1(a), 1e-30, None))


def cat_q_posterior_strided(sched: Schedule, log_x_start: jnp.ndarray,
                            log_x_t: jnp.ndarray, t: jnp.ndarray,
                            t_prev: jnp.ndarray,
                            num_classes: int) -> jnp.ndarray:
    """q(x_{t_prev} | x_t, x0-distribution) across a stride of several
    timesteps: the forward kernel over (t_prev, t] has cumulative retention
    prod(alpha) = ca_t / ca_{t_prev}. Reduces exactly to
    :func:`cat_q_posterior` at t_prev = t-1 (span = alpha_t), and to the
    reference's t=0 behavior at t_prev = -1 (span = ca_0, evidence = x0)."""
    ndim = log_x_t.ndim
    tp = jnp.maximum(t_prev, 0)
    lca_t = _extract(sched.log_cumprod_alpha, t, ndim)
    lca_p = _extract(sched.log_cumprod_alpha, tp, ndim)
    tp_neg = t_prev.reshape((-1,) + (1,) * (ndim - 1)) < 0
    lca_p = jnp.where(tp_neg, 0.0, lca_p)
    log_span = lca_t - lca_p
    log_qxt = log_add_exp(log_x_t + log_span,
                          _log1mexp(log_span) - np.log(num_classes))
    log_ev = cat_q_pred(sched, log_x_start, tp, num_classes)
    log_ev = jnp.where(tp_neg, log_x_start, log_ev)
    unnormed = log_ev + log_qxt
    return unnormed - jax.nn.logsumexp(unnormed, axis=1, keepdims=True)


def sample_gm(denoise_fn: Callable, sched: Schedule, cond_T: int, batch: int,
              rng: jax.Array,
              dyn_clip: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
              num_classes: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse joint sampling (gmd.py:921-942) -> (f0 [B,T,1], uv [B,T]).

    dyn_clip: optional (lower, upper) [B, T, 1] bounds for x0 (MIDI +/- 3
    semitones in normed log2-Hz space, stylesinger.py:275-283).
    """
    T = sched.num_timesteps
    rng, rng_f0, rng_uv = jax.random.split(rng, 3)
    z_f0 = jax.random.normal(rng_f0, (batch, cond_T, 1))
    log_z_uv = log_sample_categorical(
        rng_uv, jnp.zeros((batch, num_classes, cond_T)), num_classes)

    clip = dyn_clip if dyn_clip is not None else (-1.0, 1.0)

    def step(carry, inp):
        z_f0, log_z_uv = carry
        t_scalar, rng_i = inp
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        rng_g, rng_c = jax.random.split(rng_i)
        out = denoise_fn(z_f0, log_onehot_to_index(log_z_uv), t)
        eps_pred = out[..., :1]
        uv_logits = jnp.swapaxes(out[..., 1:], 1, 2)
        z_f0 = gaussian_p_sample(sched, z_f0, t, eps_pred, rng_g, clip=clip)
        log_model = cat_p_pred(sched, uv_logits, log_z_uv, t, num_classes)
        log_z_uv = log_sample_categorical(rng_c, log_model, num_classes)
        return (z_f0, log_z_uv), None

    ts = jnp.arange(T - 1, -1, -1)
    rngs = jax.random.split(rng, T)
    (z_f0, log_z_uv), _ = jax.lax.scan(step, (z_f0, log_z_uv), (ts, rngs))
    return z_f0, log_onehot_to_index(log_z_uv).astype(jnp.float32)


def sample_gm_dual(denoise_fn_a: Callable, denoise_fn_b: Callable,
                   sched: Schedule, cond_T: int, batch: int, rng: jax.Array,
                   dyn_clip: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                   num_classes: int = 2, speedup: int = 1):
    """Run the domain-agnostic and domain-specific joint f0+uv reverse
    chains in ONE ``lax.scan`` (the reference runs them sequentially,
    stylesinger.py:249-311).  At inference the chains are independent, so
    fusing them halves the scan count — on small-batch serving the fixed
    per-step dispatch dominates, making this ~2x on the F0 stage.

    ``speedup > 1`` takes strided jumps (cfg ``f0_speedup``, no analogue in
    the reference): DDIM (eta=0) for the Gaussian f0 half and the
    span-generalized categorical posterior for the uv half — T/speedup
    denoiser calls per chain. ``speedup=1`` is the exact reference-parity
    ancestral sampler.

    Returns ((f0_a [B,T,1], uv_a [B,T]), (f0_b, uv_b)).
    """
    if speedup > 1:
        return _sample_gm_dual_strided(
            denoise_fn_a, denoise_fn_b, sched, cond_T, batch, rng,
            dyn_clip=dyn_clip, num_classes=num_classes, speedup=speedup)
    T = sched.num_timesteps
    rng, ra, rb, rua, rub = jax.random.split(rng, 5)
    z_a = jax.random.normal(ra, (batch, cond_T, 1))
    z_b = jax.random.normal(rb, (batch, cond_T, 1))
    log_ua = log_sample_categorical(
        rua, jnp.zeros((batch, num_classes, cond_T)), num_classes)
    log_ub = log_sample_categorical(
        rub, jnp.zeros((batch, num_classes, cond_T)), num_classes)
    clip = dyn_clip if dyn_clip is not None else (-1.0, 1.0)

    def half_step(denoise_fn, z, log_u, t, rng_i):
        rng_g, rng_c = jax.random.split(rng_i)
        out = denoise_fn(z, log_onehot_to_index(log_u), t)
        eps = out[..., :1]
        logits = jnp.swapaxes(out[..., 1:], 1, 2)
        z = gaussian_p_sample(sched, z, t, eps, rng_g, clip=clip)
        log_model = cat_p_pred(sched, logits, log_u, t, num_classes)
        log_u = log_sample_categorical(rng_c, log_model, num_classes)
        return z, log_u

    def step(carry, inp):
        z_a, log_ua, z_b, log_ub = carry
        t_scalar, rng_i = inp
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        rng_a, rng_b = jax.random.split(rng_i)
        z_a, log_ua = half_step(denoise_fn_a, z_a, log_ua, t, rng_a)
        z_b, log_ub = half_step(denoise_fn_b, z_b, log_ub, t, rng_b)
        return (z_a, log_ua, z_b, log_ub), None

    ts = jnp.arange(T - 1, -1, -1)
    rngs = jax.random.split(rng, T)
    (z_a, log_ua, z_b, log_ub), _ = jax.lax.scan(
        step, (z_a, log_ua, z_b, log_ub), (ts, rngs))
    return ((z_a, log_onehot_to_index(log_ua).astype(jnp.float32)),
            (z_b, log_onehot_to_index(log_ub).astype(jnp.float32)))


def _sample_gm_dual_strided(denoise_fn_a: Callable, denoise_fn_b: Callable,
                            sched: Schedule, cond_T: int, batch: int,
                            rng: jax.Array, dyn_clip=None,
                            num_classes: int = 2, speedup: int = 5):
    T = sched.num_timesteps
    rng, ra, rb, rua, rub = jax.random.split(rng, 5)
    z_a = jax.random.normal(ra, (batch, cond_T, 1))
    z_b = jax.random.normal(rb, (batch, cond_T, 1))
    log_ua = log_sample_categorical(
        rua, jnp.zeros((batch, num_classes, cond_T)), num_classes)
    log_ub = log_sample_categorical(
        rub, jnp.zeros((batch, num_classes, cond_T)), num_classes)
    clip = dyn_clip if dyn_clip is not None else (-1.0, 1.0)

    def half_step(denoise_fn, z, log_u, t, t_prev, rng_c):
        out = denoise_fn(z, log_onehot_to_index(log_u), t)
        eps = out[..., :1]
        logits = jnp.swapaxes(out[..., 1:], 1, 2)
        z = _gaussian_ddim_jump(sched, z, t, t_prev, eps, clip)
        log_x0 = jax.nn.log_softmax(logits, axis=1)
        log_model = cat_q_posterior_strided(sched, log_x0, log_u, t, t_prev,
                                            num_classes)
        log_u = log_sample_categorical(rng_c, log_model, num_classes)
        return z, log_u

    def step(carry, inp):
        z_a, log_ua, z_b, log_ub = carry
        t_scalar, tp_scalar, rng_i = inp
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        tp = jnp.full((batch,), tp_scalar, dtype=jnp.int32)
        rng_a, rng_b = jax.random.split(rng_i)
        z_a, log_ua = half_step(denoise_fn_a, z_a, log_ua, t, tp, rng_a)
        z_b, log_ub = half_step(denoise_fn_b, z_b, log_ub, t, tp, rng_b)
        return (z_a, log_ua, z_b, log_ub), None

    ts = np.arange(T - 1, -1, -speedup)
    tps = np.concatenate([ts[1:], [-1]])  # land exactly on x0
    rngs = jax.random.split(rng, len(ts))
    (z_a, log_ua, z_b, log_ub), _ = jax.lax.scan(
        step, (z_a, log_ua, z_b, log_ub),
        (jnp.asarray(ts), jnp.asarray(tps), rngs))
    return ((z_a, log_onehot_to_index(log_ua).astype(jnp.float32)),
            (z_b, log_onehot_to_index(log_ub).astype(jnp.float32)))


def sample_shallow(denoise_fn: Callable, sched: Schedule,
                   coarse_norm: jnp.ndarray, rng: jax.Array,
                   K_step: int) -> jnp.ndarray:
    """Shallow diffusion: q_sample the coarse mel to t=K-1 then K reverse
    steps (shallow_diffusion_tts.py:297-306). coarse_norm: [B, T, M]."""
    b = coarse_norm.shape[0]
    rng, rng_q = jax.random.split(rng)
    t0 = jnp.full((b,), K_step - 1, dtype=jnp.int32)
    noise0 = jax.random.normal(rng_q, coarse_norm.shape, coarse_norm.dtype)
    x = gaussian_q_sample(sched, coarse_norm, t0, noise0)

    def step(x, inp):
        t_scalar, rng_i = inp
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        eps_pred = denoise_fn(x, t)
        x = gaussian_p_sample(sched, x, t, eps_pred, rng_i, clip=(-1.0, 1.0))
        return x, None

    ts = jnp.arange(K_step - 1, -1, -1)
    rngs = jax.random.split(rng, K_step)
    x, _ = jax.lax.scan(step, x, (ts, rngs))
    return x


def sample_shallow_plms(denoise_fn: Callable, sched: Schedule,
                        coarse_norm: jnp.ndarray, rng: jax.Array,
                        K_step: int, speedup: int) -> jnp.ndarray:
    """PLMS accelerated shallow sampling (reference
    ``p_sample_plms``, shallow_diffusion_tts.py:165-197; PNDM,
    arXiv 2202.09778): K/speedup denoiser calls using a 4th-order
    Adams-Bashforth combination of the last noise predictions.

    The reference keeps a Python-side ``noise_list``; here the last three
    predictions ride the ``lax.scan`` carry, with the step index selecting
    the correct lower-order formula at the start of the chain.
    """
    b = coarse_norm.shape[0]
    interval = speedup
    n_steps = K_step // speedup
    rng, rng_q = jax.random.split(rng)
    t0 = jnp.full((b,), K_step - 1, dtype=jnp.int32)
    noise0 = jax.random.normal(rng_q, coarse_norm.shape, coarse_norm.dtype)
    x = gaussian_q_sample(sched, coarse_norm, t0, noise0)
    ac = jnp.asarray(sched.alphas_cumprod)

    def get_x_pred(x, noise_t, t):
        a_t = _extract(ac, t, x.ndim)
        a_prev = _extract(ac, jnp.maximum(t - interval, 0), x.ndim)
        sq_t, sq_prev = jnp.sqrt(a_t), jnp.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1.0 / (sq_t * (sq_t + sq_prev))) * x -
            1.0 / (sq_t * (jnp.sqrt((1 - a_prev) * a_t) +
                           jnp.sqrt((1 - a_t) * a_prev))) * noise_t)
        return x + x_delta

    zeros = jnp.zeros_like(x)

    def step(carry, inp):
        x, n1, n2, n3 = carry           # last three noise preds (newest n1)
        t_scalar, idx = inp
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        noise_pred = denoise_fn(x, t)

        def order1(_):
            x_pred = get_x_pred(x, noise_pred, t)
            noise_prev = denoise_fn(
                x_pred, jnp.maximum(t - interval, 0))
            return (noise_pred + noise_prev) / 2

        def order2(_):
            return (3 * noise_pred - n1) / 2

        def order3(_):
            return (23 * noise_pred - 16 * n1 + 5 * n2) / 12

        def order4(_):
            return (55 * noise_pred - 59 * n1 + 37 * n2 - 9 * n3) / 24

        prime = jax.lax.switch(jnp.minimum(idx, 3),
                               [order1, order2, order3, order4], None)
        x_prev = get_x_pred(x, prime, t)
        return (x_prev, noise_pred, n1, n2), None

    ts = jnp.arange(K_step - interval, -1, -interval)
    idxs = jnp.arange(len(ts))
    (x, _, _, _), _ = jax.lax.scan(step, (x, zeros, zeros, zeros),
                                   (ts, idxs))
    return x


def sample_shallow_dpmpp(denoise_fn: Callable, sched: Schedule,
                         coarse_norm: jnp.ndarray, rng: jax.Array,
                         K_step: int, n_steps: int) -> jnp.ndarray:
    """DPM-Solver++(2M) shallow sampling (Lu et al., arXiv 2211.01095,
    Algorithm 2, data-prediction multistep variant): ``n_steps`` denoiser
    calls instead of the exact chain's ``K_step``.

    Goes beyond the reference's samplers (it ships only ancestral +
    PLMS/PNDM, shallow_diffusion_tts.py:156-197): the exponential-
    integrator formulation is exact for linear drift, so 8-12 NFE match
    PLMS-20's quality on this chain. Grid = K_step-1 .. 0 in lambda space
    over the discrete schedule; the final step is the solver's sigma->0
    limit (x = x0 prediction), mirroring the exact sampler's t=0 behavior
    of landing on the posterior mean. Compiled as one ``lax.scan``.
    """
    b = coarse_norm.shape[0]
    n_steps = max(int(n_steps), 1)
    rng, rng_q = jax.random.split(rng)
    t0 = jnp.full((b,), K_step - 1, dtype=jnp.int32)
    noise0 = jax.random.normal(rng_q, coarse_norm.shape, coarse_norm.dtype)
    x = gaussian_q_sample(sched, coarse_norm, t0, noise0)

    # discrete timestep grid (descending, unique) + its lambda values
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    ts_f = np.linspace(K_step - 1, 0, n_steps)
    ts = np.unique(np.round(ts_f).astype(np.int64))[::-1]
    n = len(ts)
    alpha = np.sqrt(ac[ts])
    sigma = np.sqrt(1.0 - ac[ts])
    lam = np.log(alpha) - np.log(np.maximum(sigma, 1e-12))
    # per-iteration constants: update FROM grid point i TO i+1
    h = np.append(lam[1:] - lam[:-1], np.inf)          # h[n-1] = sigma->0
    with np.errstate(invalid="ignore"):
        r = np.append(np.inf, h[:-1])[: n] / np.maximum(h, 1e-12)
    r = np.nan_to_num(r, posinf=1.0)                   # r_i = h_{i-1}/h_i
    # lower-order final (diffusers' lower_order_final): the sigma->0 step
    # must be 1st order — r=inf makes the 2M correction term vanish
    r[-1] = np.inf
    sig_ratio = np.append(sigma[1:] / np.maximum(sigma[:-1], 1e-12), 0.0)
    alpha_next = np.append(alpha[1:], 1.0)
    phi = np.expm1(-h)                                  # e^{-h} - 1
    phi[-1] = -1.0                                      # sigma->0 limit

    consts = jnp.asarray(
        np.stack([sig_ratio, alpha_next * -phi, r], -1), jnp.float32)
    ts_j = jnp.asarray(ts.copy(), jnp.int32)
    idxs = jnp.arange(n)

    def x0_of(x, t_scalar, eps):
        a_t = _extract(jnp.asarray(sched.sqrt_alphas_cumprod),
                       jnp.full((b,), t_scalar, jnp.int32), x.ndim)
        s_t = _extract(jnp.asarray(sched.sqrt_one_minus_alphas_cumprod),
                       jnp.full((b,), t_scalar, jnp.int32), x.ndim)
        return jnp.clip((x - s_t * eps) / a_t, -1.0, 1.0)

    def step(carry, inp):
        x, prev_x0 = carry
        t_scalar, idx, cst = inp
        sig_ratio_i, gain_i, r_i = cst[0], cst[1], cst[2]
        eps = denoise_fn(x, jnp.full((b,), t_scalar, jnp.int32))
        x0 = x0_of(x, t_scalar, eps)

        def first_order(_):
            return x0

        def second_order(_):
            # D = (1 + 1/(2r)) x0_i - (1/(2r)) x0_{i-1}
            c2 = 1.0 / (2.0 * jnp.maximum(r_i, 1e-6))
            return (1.0 + c2) * x0 - c2 * prev_x0

        d = jax.lax.cond(idx == 0, first_order, second_order, None)
        # final virtual step (sigma -> 0): sig_ratio=0, gain=alpha*1 -> x=d
        x_next = sig_ratio_i * x + gain_i * d
        return (x_next, x0), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)),
                             (ts_j, idxs, consts))
    return x


# ---------------------------------------------------------------------------
# ProDiff (x0-parameterized few-step diffusion, reference modules/diff/
# prodiff.py:59-233)
# ---------------------------------------------------------------------------

def vpsde_beta_t(t: int, big_t: int, min_beta: float,
                 max_beta: float) -> float:
    t_coef = (2 * t - 1) / (big_t ** 2)
    return 1.0 - np.exp(-min_beta / big_t -
                        0.5 * (max_beta - min_beta) * t_coef)


def prodiff_betas(timesteps: int, schedule_mode: str = "vpsde",
                  min_beta: float = 0.1, max_beta: float = 40.0,
                  s: float = 0.008) -> np.ndarray:
    """Noise schedules of the ProDiff teacher (prodiff.py:28-47); note the
    reference instantiates with ``timesteps + 1`` entries."""
    if schedule_mode == "linear":
        return np.linspace(1e-6, 0.01, timesteps)
    if schedule_mode == "cosine":
        return cosine_beta_schedule(timesteps, s)
    if schedule_mode == "vpsde":
        return np.array([vpsde_beta_t(t, timesteps, min_beta, max_beta)
                         for t in range(1, timesteps + 1)])
    raise ValueError(schedule_mode)


def make_prodiff_schedule(timesteps: int,
                          schedule_mode: str = "vpsde") -> Schedule:
    betas = prodiff_betas(timesteps + 1, schedule_mode).astype(np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    log_alpha = np.log(alphas)
    f32 = lambda x: x.astype(np.float32)  # noqa: E731
    log_1_min = lambda a: np.log(1 - np.exp(a) + 1e-40)  # noqa: E731
    return Schedule(
        betas=f32(betas), alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(post_var, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas)
                                 / (1.0 - ac)),
        log_alpha=f32(log_alpha),
        log_1_min_alpha=f32(log_1_min(log_alpha)),
        log_cumprod_alpha=f32(np.cumsum(log_alpha)),
        log_1_min_cumprod_alpha=f32(log_1_min(np.cumsum(log_alpha))),
    )


def prodiff_train(denoise_fn: Callable, sched: Schedule, timesteps: int,
                  x_start: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """One training pass: diffuse GT mel to a random t and predict x0
    directly (prodiff.py:194-214). Returns x0_pred [B, T, M]; the mel
    reconstruction loss is applied by the caller."""
    b = x_start.shape[0]
    rng_t, rng_noise = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, timesteps + 1)
    noise = jax.random.normal(rng_noise, x_start.shape, x_start.dtype)
    x_t = gaussian_q_sample(sched, x_start, t, noise)
    return denoise_fn(x_t, t)


def sample_prodiff(denoise_fn: Callable, sched: Schedule, timesteps: int,
                   shape: Tuple[int, ...], rng: jax.Array) -> jnp.ndarray:
    """Few-step reverse sampling from pure noise with x0 parameterization
    (prodiff.py:216-224)."""
    rng, rng0 = jax.random.split(rng)
    x = jax.random.normal(rng0, shape)

    def step(x, inp):
        t_scalar, rng_i = inp
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        x0_pred = denoise_fn(x, t)
        mean, log_var = q_posterior(sched, x0_pred, x, t)
        noise = jax.random.normal(rng_i, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise, None

    ts = jnp.arange(timesteps - 1, -1, -1)
    rngs = jax.random.split(rng, timesteps)
    x, _ = jax.lax.scan(step, x, (ts, rngs))
    return x


def norm_spec(x: jnp.ndarray, spec_min: jnp.ndarray,
              spec_max: jnp.ndarray) -> jnp.ndarray:
    return (x - spec_min) / (spec_max - spec_min) * 2 - 1


def denorm_spec(x: jnp.ndarray, spec_min: jnp.ndarray,
                spec_max: jnp.ndarray) -> jnp.ndarray:
    return (x + 1) / 2 * (spec_max - spec_min) + spec_min
