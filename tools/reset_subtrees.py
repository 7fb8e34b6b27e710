"""Checkpoint surgery: re-initialize named top-level param subtrees.

Use case (round 2): a curriculum mis-schedule trained the shallow-diffusion
eps head (``postdiff`` + its ``ln_proj`` conditioner) at the Noam-peak
learning rate, saturating its gated units — after which the loss sits at the
predict-zero baseline E|eps|=sqrt(2/pi) forever and Adam noise only deepens
the saturation.  The reference never exposes this head to peak lr: it stays
frozen at init until ``diff_start`` (100k of 320k steps,
reference tasks/StyleSinger/stylesinger.py:60-61) by which point the rsqrt
schedule has decayed to ~4e-4.  Resetting the dead subtrees to a fresh init
inside the latest checkpoint restores exactly those semantics for a resumed
run whose ``diff_start`` is moved past the hot part of the schedule —
without retraining the (healthy, converged) rest of the model.

Resets, for each named subtree: params -> fresh init, and every optimizer
moment (Adam mu/nu) -> its fresh-init zeros.  Saves as ``step+1`` so the
trainer's auto-resume picks it up.

Usage:
  python tools/reset_subtrees.py --subtrees postdiff,ln_proj \
      --steps 220000 --overrides "forcing=1600,..." [--dir data/validation]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/validation")
    ap.add_argument("--subtrees", required=True,
                    help="comma-separated top-level param keys")
    ap.add_argument("--steps", type=int, default=220000)
    ap.add_argument("--overrides", default="")
    ap.add_argument("--seed", type=int, default=4242,
                    help="PRNG seed for the fresh subtree init")
    ap.add_argument("--cpu", action="store_true", default=True,
                    help="run on CPU (checkpoints are device-agnostic)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    import jax.numpy as jnp

    from tools.validate_training import build_cfg
    raw = os.path.join(args.dir, "raw")
    binary = os.path.join(args.dir, "binary")
    work = os.path.join(args.dir, "work")
    cfg = build_cfg(raw, binary, work, args.steps, overrides=args.overrides)

    from stylesinger_tpu.data import StyleSingerDataset, collate_batch
    from stylesinger_tpu.models.stylesinger import StyleSinger
    from stylesinger_tpu.text import build_token_encoder
    from stylesinger_tpu.training.checkpoint import CheckpointManager
    from stylesinger_tpu.training.step import init_state

    encoder = build_token_encoder(os.path.join(binary, "phone_set.json"))
    model = StyleSinger(cfg, len(encoder))
    ds = StyleSingerDataset(cfg, "train")
    batch = collate_batch([ds[0]], cfg["frame_buckets"], cfg["token_buckets"])
    batch.pop("nsamples", None)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    fresh = init_state(model, cfg, batch, rng=jax.random.PRNGKey(args.seed))
    mgr = CheckpointManager(work, keep=cfg["num_ckpt_keep"])
    state, step = mgr.restore(fresh)
    if step == 0:
        raise SystemExit("no checkpoint to operate on")
    subtrees = [s.strip() for s in args.subtrees.split(",") if s.strip()]
    missing = [s for s in subtrees if s not in state.params]
    if missing:
        raise SystemExit(f"param subtrees not found: {missing}")

    keyset = set(subtrees)

    def patch(old_tree, fresh_tree):
        """Take ``fresh`` leaves anywhere the path crosses a reset key."""
        def pick(path, old_leaf, fresh_leaf):
            names = {getattr(p, "key", getattr(p, "name", None))
                     for p in path}
            return fresh_leaf if names & keyset else old_leaf
        return jax.tree_util.tree_map_with_path(pick, old_tree, fresh_tree)

    new_params = patch(state.params, fresh.params)
    new_opt = patch(state.opt_state, fresh.opt_state)
    state = state.replace(params=new_params, opt_state=new_opt)

    for s in subtrees:
        tot = sum(float(np.square(np.asarray(x)).sum())
                  for x in jax.tree_util.tree_leaves(new_params[s]))
        print(f"| {s}: fresh param L2 = {np.sqrt(tot):.3f}")
    mgr.save(step + 1, state)
    print(f"| saved surgically-reset checkpoint at step {step + 1} "
          f"(from {step}) in {work}/ckpt")


if __name__ == "__main__":
    main()
