"""Sharded train/eval steps for StyleSinger.

Replaces the reference's ``Trainer.run_training_batch``
(``utils/trainer.py:267-340``: fwd/bwd, grad clip 1.0, AMP scaler, NCCL
all-reduce via DDP) with one jitted pure function over a device mesh:

- the batch is sharded over the ``data`` mesh axis; XLA inserts the gradient
  all-reduce over ICI (no DDP wrapper, no loss scaling — matmuls are bf16
  natively);
- the RQ-EMA codebook state is a flax ``codebook`` collection threaded
  through the step (the reference mutates buffers with explicit
  ``dist.all_reduce``, ``modules/StyleSinger/RQ.py:86-100`` — here the EMA
  statistics are computed on globally-visible sharded activations, so the
  reduction is implicit);
- curriculum switches (rq_start / forcing / diff_start) are a static
  ``Phase`` -> at most four compiled graphs over a 320k-step run
  (``egs/stylesinger.yaml:106-133`` semantics).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from stylesinger_tpu.models import precision
from stylesinger_tpu.training.losses import compute_losses
from stylesinger_tpu.training.schedules import constant_schedule, rsqrt_schedule


def _f32_tree(tree):
    """Upcast float outputs to f32 before loss math (no-op for f32)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, tree)


class Phase(NamedTuple):
    """Static curriculum flags (hashable -> usable as a jit static arg)."""
    use_rq: bool
    forcing: bool
    use_diff: bool


def phase_for_step(step: int, cfg: Any) -> Phase:
    """Curriculum from global step (reference
    tasks/StyleSinger/stylesinger.py:57-66, stylesinger.py:192-206)."""
    return Phase(
        use_rq=bool(step > cfg["rq_start"]),
        forcing=bool(step < cfg["forcing"]),
        use_diff=bool(cfg["decoder"] == "diffsinger"
                      and step > cfg["diff_start"]),
    )


def phase_boundaries(cfg: Any) -> tuple:
    """Steps at which ``phase_for_step`` changes value — the scan
    dispatcher clips its windows to these so every step in a window runs
    under one static Phase. Single source of truth shared with
    ``Trainer._window_len``: a curriculum knob added to ``phase_for_step``
    MUST add its flip point here, or windows silently straddle the flip."""
    return (cfg["forcing"],            # forcing: step < forcing
            cfg["rq_start"] + 1,       # use_rq: step > rq_start
            cfg["diff_start"] + 1)     # use_diff: step > diff_start


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    codebook: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, codebook, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   codebook=codebook, opt_state=tx.init(params), tx=tx)


def make_optimizer(cfg: Any) -> optax.GradientTransformation:
    """AdamW (betas 0.9/0.98, wd 0) under the rsqrt schedule with global-norm
    clipping 1.0 (reference tasks/tts/tts_base.py:150-156,
    tasks/base_task.py:232)."""
    if cfg["scheduler"] == "rsqrt":
        sched = rsqrt_schedule(cfg["lr"], cfg["warmup_updates"],
                               cfg["hidden_size"])
    else:
        sched = constant_schedule(cfg["lr"])
    tx = optax.chain(
        optax.clip_by_global_norm(cfg["clip_grad_norm"]),
        optax.adamw(sched, b1=cfg["optimizer_adam_beta1"],
                    b2=cfg["optimizer_adam_beta2"],
                    weight_decay=cfg["weight_decay"]),
    )
    if cfg.get("accumulate_grad_batches", 1) > 1:
        tx = optax.MultiSteps(tx, cfg["accumulate_grad_batches"])
    return tx


_RNG_STREAMS = ("dropout", "umln", "rq", "diffusion")


def _step_rngs(rng: jax.Array, step: jnp.ndarray) -> Dict[str, jax.Array]:
    base = jax.random.fold_in(rng, step)
    keys = jax.random.split(base, len(_RNG_STREAMS))
    return dict(zip(_RNG_STREAMS, keys))


def _model_inputs(batch: Dict) -> Dict:
    """Map a data batch onto StyleSinger.__call__ kwargs (training:
    ref_mels/ref_f0 are the ground-truth clip, reference
    tasks/StyleSinger/stylesinger.py:55-56)."""
    return dict(
        txt_tokens=batch["txt_tokens"], mel2ph=batch["mel2ph"],
        spk_embed=batch["spk_embed"], emo_embed=batch.get("emo_embed"),
        ref_mels=batch["mels"], ref_f0=batch["f0"], f0=batch["f0"],
        uv=batch["uv"], note=batch["notes"], note_dur=batch["note_durs"],
        note_type=batch["note_types"],
    )


def make_step_body(model, cfg: Any):
    """The un-jitted single optimizer step
    ``body(state, batch, rng, phase) -> (state, metrics)`` shared by the
    per-step dispatcher (make_train_step) and the on-device multi-step
    scan (make_train_scan). Randomness folds in ``state.step``, so the
    stream is identical whichever dispatcher runs a given step."""

    def loss_fn(params, codebook, batch, rngs, phase: Phase):
        variables = {"params": params, "codebook": codebook}
        with precision.activation_dtype(cfg.get("compute_dtype", "float32")):
            ret, updates = model.apply(
                variables, **_model_inputs(batch), infer=False,
                use_rq=phase.use_rq, forcing=phase.forcing,
                use_diff=phase.use_diff, rngs=rngs, mutable=["codebook"])
        ret = _f32_tree(ret)
        losses = compute_losses(ret, batch, cfg, use_rq=phase.use_rq,
                                forcing=phase.forcing,
                                use_diff=phase.use_diff)
        total = sum(jax.tree_util.tree_leaves(losses))
        return total, (losses, updates.get("codebook", codebook))

    def body(state: TrainState, batch: Dict, rng: jax.Array,
             phase: Phase) -> Tuple[TrainState, Dict]:
        rngs = _step_rngs(rng, state.step)
        (total, (losses, codebook)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.codebook, batch, rngs,
                                   phase)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=params,
                                  codebook=codebook, opt_state=opt_state)
        return new_state, metrics

    return body


def make_train_step(model, cfg: Any):
    """Returns ``train_step(state, batch, rng, phase) -> (state, metrics)``,
    jitted with a static Phase and donated state."""
    return functools.partial(jax.jit, static_argnames=("phase",),
                             donate_argnames=("state",))(
        make_step_body(model, cfg))


def make_train_scan(model, cfg: Any):
    """Multi-step dispatch: runs a whole window of optimizer steps in ONE
    device program over a device-resident stacked batch set.

    ``train_scan(state, stacked, order, rng, phase)`` where ``stacked`` is
    a batch pytree with an extra leading axis N (all training batches,
    uploaded once) and ``order`` an int32 [W] vector of batch indices; the
    scan body gathers batch ``order[j]`` and applies the shared step body.
    Returns ``(state, metrics)`` with [W]-shaped metric vectors.

    This is the TPU-native answer to the reference's per-step host loop
    (utils/trainer.py:267-340): through a remote-PJRT tunnel a per-step
    dispatch pays batch upload + dispatch latency + the tunnel client's
    per-call host-RSS leak every step; scanning W steps on device pays
    them once per window (measured: 8.7 -> ~28 steps/s at W=50 on the
    tunneled v5e, with host RSS flat instead of +3 MB/step)."""
    body = make_step_body(model, cfg)

    @functools.partial(jax.jit, static_argnames=("phase",),
                       donate_argnames=("state",))
    def train_scan(state: TrainState, stacked: Dict, order: jax.Array,
                   rng: jax.Array, phase: Phase) -> Tuple[TrainState, Dict]:
        def f(st, idx):
            batch = jax.tree_util.tree_map(lambda x: x[idx], stacked)
            return body(st, batch, rng, phase)

        return jax.lax.scan(f, state, order)

    return train_scan


def make_eval_step(model, cfg: Any):
    """Validation: loss dict without optimizer/codebook updates."""

    @functools.partial(jax.jit, static_argnames=("phase",))
    def eval_step(state: TrainState, batch: Dict, rng: jax.Array,
                  phase: Phase) -> Dict:
        rngs = _step_rngs(rng, state.step)
        variables = {"params": state.params, "codebook": state.codebook}
        with precision.activation_dtype(cfg.get("compute_dtype", "float32")):
            ret, _ = model.apply(
                variables, **_model_inputs(batch), infer=False,
                deterministic=True, use_rq=phase.use_rq, forcing=phase.forcing,
                use_diff=phase.use_diff, rngs=rngs, mutable=["codebook"])
        ret = _f32_tree(ret)
        losses = compute_losses(ret, batch, cfg, use_rq=phase.use_rq,
                                forcing=phase.forcing,
                                use_diff=phase.use_diff)
        losses["total_loss"] = sum(jax.tree_util.tree_leaves(losses))
        return losses

    return eval_step


def init_state(model, cfg: Any, example_batch: Dict,
               rng: Optional[jax.Array] = None) -> TrainState:
    """Initialize params + codebook + optimizer from an example batch."""
    rng = jax.random.PRNGKey(cfg["seed"]) if rng is None else rng
    init_rngs = dict(params=rng, **_step_rngs(rng, jnp.zeros((), jnp.int32)))
    variables = model.init(init_rngs, **_model_inputs(example_batch),
                           infer=False, use_rq=True, forcing=False,
                           use_diff=cfg["decoder"] == "diffsinger")
    params = variables["params"]
    codebook = variables.get("codebook", FrozenDict())
    return TrainState.create(params, codebook, make_optimizer(cfg))
