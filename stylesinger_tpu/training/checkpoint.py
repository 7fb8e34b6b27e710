"""Checkpoint I/O with keep-K pruning, best-val tracking, and auto-resume.

Parity targets (AaronZ345/StyleSinger):
- ``utils/trainer.py:395-434``: periodic ``model_ckpt_steps_N`` saves with
  optimizer state + global step, atomic write, keep-K pruning, best-val copy;
- ``utils/ckpt_utils.py:8-68``: latest-checkpoint discovery and non-strict
  loading (shape-mismatched keys dropped).

Implemented on orbax ``CheckpointManager`` (atomicity, async save, and
sharded-array support come for free on TPU pods).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """Saves/restores ``TrainState`` pytrees under ``<work_dir>/ckpt``."""

    def __init__(self, work_dir: str, keep: int = 3, save_best: bool = True,
                 milestone_interval: int = 0):
        self.dir = os.path.join(os.path.abspath(work_dir), "ckpt")
        self.best_dir = os.path.join(os.path.abspath(work_dir), "ckpt_best")
        self.milestone_dir = os.path.join(os.path.abspath(work_dir),
                                          "ckpt_milestones")
        os.makedirs(self.dir, exist_ok=True)
        self.keep = keep
        self.save_best = save_best
        self.milestone_interval = int(milestone_interval)
        self._milestone_mgr = None
        self._best: Optional[float] = None
        if _HAS_ORBAX:
            # NOTE: the periodic manager must NOT get a best_fn — orbax then
            # prunes to the best-K *by metric* and deletes the latest step,
            # which breaks resume (reference semantics are keep-K LATEST,
            # utils/trainer.py:400-402, plus a separate best copy :406-413)
            self._mgr = ocp.CheckpointManager(
                self.dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                     create=True))
            if self.milestone_interval > 0:
                # permanent quality-sweep snapshots: never pruned
                # (max_to_keep=None), eval-only payload (no opt state) so a
                # full 320k run stores 8 x ~model-size, not 8 x train-state
                self._milestone_mgr = ocp.CheckpointManager(
                    self.milestone_dir,
                    options=ocp.CheckpointManagerOptions(max_to_keep=None,
                                                         create=True))
            self._best_mgr = None
            if save_best:
                self._best_mgr = ocp.CheckpointManager(
                    self.best_dir,
                    options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                         create=True))
                prev = self._best_mgr.latest_step()
                if prev is not None:  # resume: don't clobber a better copy
                    try:
                        m = self._best_mgr.metrics(prev)
                        self._best = float(m["val_loss"]) if m else None
                    except Exception:
                        self._best = None
                    if self._best is None:  # orbax metrics unreadable:
                        self._best = self._read_best_sidecar()
                    if self._best is None:
                        # a best copy exists but its metric is unknowable —
                        # preserve the artifact out of the manager's reach
                        # (a noisy first post-resume val must never cause
                        # its deletion) and restart best-tracking fresh so
                        # the sidecar always describes the stored copy
                        legacy = self.best_dir + "_legacy"
                        n = 1
                        while os.path.exists(legacy):
                            n += 1
                            legacy = f"{self.best_dir}_legacy{n}"
                        print("| WARN: best checkpoint metric unreadable; "
                              f"preserving the copy at {legacy} and "
                              "restarting best-tracking")
                        self._best_mgr.close()
                        os.rename(self.best_dir, legacy)
                        self._best_mgr = ocp.CheckpointManager(
                            self.best_dir,
                            options=ocp.CheckpointManagerOptions(
                                max_to_keep=1, create=True))
        else:
            self._mgr = None
            self._best_mgr = None

    # -------------------------------------------------------------- save
    def save(self, step: int, state: Any,
             val_loss: Optional[float] = None) -> None:
        if self._mgr is not None:
            payload = {"params": state.params, "codebook": state.codebook,
                       "opt_state": state.opt_state,
                       "step": np.asarray(step)}
            self._mgr.save(step, args=ocp.args.StandardSave(payload))
            if self._milestone_mgr is not None and step > 0 and \
                    step % self.milestone_interval == 0 and \
                    step not in (self._milestone_mgr.all_steps() or []):
                self._milestone_mgr.save(step, args=ocp.args.StandardSave(
                    {"params": state.params, "codebook": state.codebook,
                     "step": np.asarray(step)}))
                self._milestone_mgr.wait_until_finished()
            if self._best_mgr is not None and val_loss is not None and \
                    (self._best is None or float(val_loss) < self._best):
                self._best = float(val_loss)
                self._best_mgr.save(
                    step, args=ocp.args.StandardSave(payload),
                    metrics={"val_loss": self._best})
                self._best_mgr.wait_until_finished()
                self._write_best_sidecar(step, self._best)
            self._mgr.wait_until_finished()
        else:  # pragma: no cover - fallback without orbax
            import pickle
            path = os.path.join(self.dir, f"state_{step}.pkl")
            with open(path + ".part", "wb") as f:
                pickle.dump(jax.device_get(
                    {"params": state.params, "codebook": state.codebook,
                     "opt_state": state.opt_state, "step": step}), f)
            os.replace(path + ".part", path)

    # sidecar: durable val_loss record next to the best copy, so a resume
    # still knows the baseline when orbax metrics are unreadable (else the
    # next validation would overwrite the best copy unconditionally)
    def _sidecar_path(self) -> str:
        return os.path.join(self.best_dir, "best_val.json")

    def _write_best_sidecar(self, step: int, val_loss: float) -> None:
        import json
        try:
            with open(self._sidecar_path(), "w") as f:
                json.dump({"step": int(step), "val_loss": float(val_loss)},
                          f)
        except OSError:  # never fail a save over bookkeeping
            pass

    def _read_best_sidecar(self) -> Optional[float]:
        import json
        try:
            with open(self._sidecar_path()) as f:
                return float(json.load(f)["val_loss"])
        except Exception:
            return None

    # ----------------------------------------------------------- restore
    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f.split("_")[1].split(".")[0])
                 for f in os.listdir(self.dir) if f.startswith("state_")]
        return max(steps) if steps else None

    def milestone_steps(self) -> list:
        """Steps with a permanent quality-sweep snapshot (sorted)."""
        if self._milestone_mgr is None:
            if not os.path.isdir(self.milestone_dir):
                return []
            # read-only sweep from another process: list the orbax layout
            steps = [int(d) for d in os.listdir(self.milestone_dir)
                     if d.isdigit()]
            return sorted(steps)
        return sorted(self._milestone_mgr.all_steps() or [])

    def restore_milestone(self, state: Any, step: int) -> Any:
        """Restore a milestone snapshot's params/codebook into ``state``
        (optimizer state untouched — milestones are eval-only)."""
        if not _HAS_ORBAX:  # pragma: no cover
            raise RuntimeError("milestone snapshots need orbax")
        mgr = self._milestone_mgr or ocp.CheckpointManager(
            self.milestone_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=None))
        target = {"params": state.params, "codebook": state.codebook,
                  "step": np.asarray(step)}
        payload = mgr.restore(step, args=ocp.args.StandardRestore(target))
        import jax.numpy as jnp
        return state.replace(params=payload["params"],
                             codebook=payload["codebook"],
                             step=jnp.asarray(step, jnp.int32))

    def best_step(self) -> Optional[int]:
        """Step of the best-val copy (reference model_ckpt_best.pt)."""
        if self._best_mgr is not None:
            return self._best_mgr.latest_step()
        return None

    def restore_best(self, state: Any) -> Tuple[Any, int]:
        """Restore the best-val checkpoint (falls back to latest)."""
        step = self.best_step()
        if step is None or self._best_mgr is None:
            return self.restore(state)
        target = {"params": state.params, "codebook": state.codebook,
                  "opt_state": state.opt_state, "step": np.asarray(step)}
        payload = self._best_mgr.restore(
            step, args=ocp.args.StandardRestore(target))
        import jax.numpy as jnp
        state = state.replace(
            params=payload["params"], codebook=payload["codebook"],
            opt_state=payload["opt_state"],
            step=jnp.asarray(step, jnp.int32))
        return state, int(step)

    def restore(self, state: Any, step: Optional[int] = None
                ) -> Tuple[Any, int]:
        """Restore into the structure of ``state``; returns (state, step)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state, 0
        if self._mgr is not None:
            target = {"params": state.params, "codebook": state.codebook,
                      "opt_state": state.opt_state,
                      "step": np.asarray(step)}
            payload = self._mgr.restore(
                step, args=ocp.args.StandardRestore(target))
        else:  # pragma: no cover
            import pickle
            with open(os.path.join(self.dir, f"state_{step}.pkl"),
                      "rb") as f:
                payload = pickle.load(f)
        import jax.numpy as jnp
        state = state.replace(
            params=payload["params"], codebook=payload["codebook"],
            opt_state=payload["opt_state"],
            step=jnp.asarray(step, jnp.int32))
        return state, int(step)
