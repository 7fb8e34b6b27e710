"""Task-layer train steps for the FastSpeech2 and PitchExtractor families.

Parity targets (AaronZ345/StyleSinger):
- ``FastSpeech2Task`` (``tasks/tts/fs2.py:24-241``): plain TTS training —
  mel (l1+ssim) + duration + f0/uv (+ energy) losses over the FS2 model;
- ``PitchExtractorTask`` (``tasks/tts/pe.py:1-154``): mel -> (f0, uv)
  regression for re-estimating F0 from generated mels.

Same SPMD design as the StyleSinger step (training/step.py); these are the
remaining members of the reference's task registry (``tasks/run.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import optax

from stylesinger_tpu.training.losses import (
    duration_losses, f0_uv_losses, mel_losses,
)
from stylesinger_tpu.training.step import TrainState, make_optimizer


def make_fs2_train_step(model, cfg: Any):
    """FS2 step: model(txt, mel2ph, spk, f0, uv) -> mel; losses as in
    FastSpeech2Task.run_model (fs2.py:100-127)."""

    def loss_fn(params, batch, rngs):
        ret = model.apply(
            {"params": params}, batch["txt_tokens"], batch["mel2ph"],
            batch.get("spk_embed"), batch["f0"], batch["uv"],
            batch.get("energy"), infer=False, rngs=rngs)
        losses = {}
        losses.update(mel_losses(ret["mel_out"], batch["mels"],
                                 cfg["mel_loss"]))
        losses.update(duration_losses(ret["dur"], batch["mel2ph"],
                                      batch["txt_tokens"], cfg,
                                      is_sil=batch.get("is_sil")))
        if cfg["use_pitch_embed"] and cfg["pitch_type"] == "frame":
            nonpadding = (batch["mel2ph"] > 0).astype(ret["mel_out"].dtype)
            losses.update(f0_uv_losses(ret["pitch_pred"], batch["f0"],
                                       batch["uv"], nonpadding, cfg))
        total = sum(jax.tree_util.tree_leaves(losses))
        return total, losses

    @jax.jit
    def train_step(state: TrainState, batch: Dict, rng: jax.Array
                   ) -> Tuple[TrainState, Dict]:
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rngs)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        losses["total_loss"] = total
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), losses

    return train_step


def init_fs2_state(model, cfg: Any, batch: Dict,
                   rng=None) -> TrainState:
    rng = jax.random.PRNGKey(cfg["seed"]) if rng is None else rng
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["txt_tokens"],
        batch["mel2ph"], batch.get("spk_embed"), batch["f0"], batch["uv"],
        batch.get("energy"), infer=False)
    return TrainState.create(variables["params"], {}, make_optimizer(cfg))


def make_pe_train_step(model, cfg: Any):
    """PitchExtractor step (tasks/tts/pe.py): mel -> f0/uv regression."""
    from stylesinger_tpu.models.pe import pe_loss

    def loss_fn(params, batch, rngs):
        ret = model.apply({"params": params}, batch["mels"],
                          deterministic=False, rngs=rngs)
        losses = pe_loss(ret, batch["f0"], batch["uv"], cfg)
        return sum(jax.tree_util.tree_leaves(losses)), losses

    @jax.jit
    def train_step(state: TrainState, batch: Dict, rng: jax.Array
                   ) -> Tuple[TrainState, Dict]:
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rngs)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        losses["total_loss"] = total
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), losses

    return train_step
