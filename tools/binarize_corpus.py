"""Corpus-gen + binarize phase of the validation harness, as its own
process pinned to the host CPU backend.

Why a separate process: binarization dispatches thousands of tiny ops
(per-item F0 tracking, GE2E embedding) — pathological through a
remote-PJRT TPU tunnel (measured: 0 items in 15 min tunneled vs ~1
item/s on host CPU) — while the training phase that follows wants the
TPU. JAX fixes the platform per process, so validate_training runs this
in a child (the same split the reference gets for free from its separate
``data_gen/tts/bin/binarize.py`` CLI).

Usage:
  python tools/binarize_corpus.py [--dir data/validation] [--utts 120]
                                  [--steps 3000] [--overrides k=v,...]

(--steps only affects curriculum constants baked into the cfg, not the
binarized data; the default matches validate_training's default.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data/validation")
    ap.add_argument("--utts", type=int, default=120)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--overrides", default="")
    args = ap.parse_args()

    # build_cfg / load_config are JAX-free, so the platform pin can honor
    # the binarize_platform knob (ADVICE r3: the unconditional pin made the
    # documented opt-out work for `run.py binarize` but not this path)
    from tools.validate_training import build_cfg

    raw_dir = os.path.join(args.dir, "raw")
    bin_dir = os.path.join(args.dir, "binary")
    work_dir = os.path.join(args.dir, "work")
    cfg = build_cfg(raw_dir, bin_dir, work_dir, args.steps,
                    overrides=args.overrides)

    if cfg.get("binarize_platform", "cpu") == "cpu":
        import jax

        # the axon sitecustomize locks JAX_PLATFORMS before user code runs;
        # the config-level update is the supported override
        # (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    corpus_regenerated = False
    if not os.path.exists(os.path.join(raw_dir, "metadata.json")):
        from tools.make_synthetic_corpus import make_corpus
        make_corpus(raw_dir, args.utts)
        corpus_regenerated = True
        print(f"| corpus: {args.utts} utts -> {raw_dir}")
    # rebinarize whenever the corpus was (re)generated: stale shards from a
    # previous corpus must never be paired with new raw data (ADVICE r3)
    if corpus_regenerated or not os.path.exists(
            os.path.join(bin_dir, "train.data")):
        from stylesinger_tpu.data.binarize import StyleSingingBinarizer
        StyleSingingBinarizer(cfg).process()
        print(f"| binarized -> {bin_dir}")


if __name__ == "__main__":
    main()
