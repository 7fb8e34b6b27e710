"""Unified CLI: preprocess / binarize / train / infer / test.

Parity targets: ``tasks/run.py`` (task launcher), ``data_gen/tts/bin/
{binarize,preprocess,train_mfa_align}.py`` (data CLIs), and
``inference/StyleSinger.py`` __main__ (demo synthesis) in
AaronZ345/StyleSinger — collapsed into one entry point:

  python -m stylesinger_tpu.run preprocess --config egs/stylesinger.yaml [--mfa]
  python -m stylesinger_tpu.run binarize --config egs/stylesinger.yaml
  python -m stylesinger_tpu.run train    --config egs/stylesinger.yaml --exp_name EXP
  python -m stylesinger_tpu.run infer    --config egs/stylesinger.yaml --exp_name EXP
"""

from __future__ import annotations

import argparse
import os
import sys

# exit status for "checkpointed and restartable" (EX_TEMPFAIL); emitted
# when the host-RSS watchdog trips (training/trainer.py::HostMemoryExceeded)
RESTART_EXIT_CODE = 75


def supervise(cmd: list, max_restarts: int = 100) -> int:
    """Run ``cmd`` as a subprocess, restarting while it exits with
    ``RESTART_EXIT_CODE``; returns the final exit status.

    Together with the trainer's auto-resume-from-latest this turns the
    host-RSS watchdog's graceful exit into a bounded-memory restart loop
    (needed on remote-PJRT hosts whose client library leaks per step —
    docs/OPS.md)."""
    import subprocess

    for i in range(max_restarts):
        code = subprocess.call(cmd)
        if code != RESTART_EXIT_CODE:
            return code
        print(f"| supervise: restart {i + 1} (exit {code}: watchdog "
              "checkpointed; resuming)")
    print(f"| supervise: giving up after {max_restarts} restarts")
    return RESTART_EXIT_CODE


def main() -> None:
    ap = argparse.ArgumentParser("stylesinger_tpu")
    ap.add_argument("command", choices=["train", "binarize", "infer",
                                        "test", "preprocess", "mfa-align"])
    ap.add_argument("--config", default=None)
    ap.add_argument("--exp_name", default="stylesinger")
    ap.add_argument("--hparams", default="",
                    help="'a=1,b.c=2' overrides (reference --hparams)")
    ap.add_argument("--work_dir_root", default="checkpoints")
    ap.add_argument("--ref_audio", default=None)
    ap.add_argument("--out", default="infer_out/test.wav")
    ap.add_argument("--supervise", action="store_true",
                    help="train only: restart-and-resume when the host-RSS "
                    "watchdog checkpoints and exits (code 75)")
    ap.add_argument("--allow_random", action="store_true",
                    help="infer only: permit demo synthesis from random "
                    "weights when the work dir has no checkpoint")
    ap.add_argument("--mfa", action="store_true",
                    help="preprocess only: also lay out the MFA alignment "
                    "corpus (reference train_mfa_align.py)")
    args = ap.parse_args()

    if args.supervise and args.command == "train":
        cmd = [sys.executable, "-m", "stylesinger_tpu.run"] + \
            [a for a in sys.argv[1:] if a != "--supervise"]
        raise SystemExit(supervise(cmd))

    from stylesinger_tpu.config import load_config, save_config

    cfg = load_config(args.config, args.hparams)
    work_dir = os.path.join(args.work_dir_root, args.exp_name)
    cfg["work_dir"] = work_dir

    if args.command == "preprocess":
        # reference preprocess CLI (data_gen/tts/bin/preprocess.py:9-16 +
        # train_mfa_align.py): raw corpus -> processed metadata.json /
        # phone_set.json, plus an MFA input layout when --mfa is given.
        # Raw rows come from a registered meta adapter (cfg pre_align_cls,
        # the analogue of egs/datasets/audio/*/pre_align.py) or from an
        # existing <raw_data_dir>/metadata.json.
        import json

        from stylesinger_tpu.data.preprocess import (Preprocessor,
                                                     load_meta_data)

        raw_dir = cfg.get("raw_data_dir") or cfg["processed_data_dir"]
        adapter = cfg.get("pre_align_cls", "")
        if adapter:
            items = load_meta_data(adapter, raw_dir)
        else:
            meta_fn = os.path.join(raw_dir, "metadata.json")
            if not os.path.exists(meta_fn):
                raise SystemExit(
                    f"| ERROR: no meta adapter (cfg pre_align_cls) and no "
                    f"{meta_fn}; nothing to preprocess")
            items = json.load(open(meta_fn))
        pre = Preprocessor(cfg, language=cfg.get("language", "zh"))
        rows = pre.process(items, out_dir=cfg["processed_data_dir"])
        if args.mfa:
            mfa_dir = pre.build_mfa_inputs(
                rows, out_dir=cfg["processed_data_dir"])
            print(f"| wrote MFA corpus at {mfa_dir}")
        return

    if args.command == "mfa-align":
        # reference train_mfa_align.py (data_gen/tts/bin/train_mfa_align.py
        # :1-15): shells out to Montreal Forced Aligner over the processed
        # corpus (the referenced run_mfa_train_align.sh is absent upstream,
        # so the contract here is the modern `mfa train` CLI). Completes
        # the raw-wav -> preprocess --mfa -> mfa-align -> binarize chain;
        # binarize consumes the TextGrids via dsp/textgrid_align.py.
        import shutil
        import subprocess

        out_dir = cfg["processed_data_dir"]
        mfa_dir = os.path.join(out_dir, "mfa_inputs")
        dict_fn = os.path.join(out_dir, "mfa_dict.txt")
        tg_dir = os.path.join(out_dir, "mfa_outputs")
        if not (os.path.isdir(mfa_dir) and os.path.exists(dict_fn)):
            raise SystemExit(
                f"| ERROR: no MFA corpus at {mfa_dir} — run "
                "`run.py preprocess --mfa` first")
        mfa_bin = shutil.which("mfa")
        if mfa_bin is None:
            raise SystemExit(
                "| ERROR: Montreal Forced Aligner (`mfa`) is not installed "
                "in this environment. Install it (conda install -c "
                "conda-forge montreal-forced-aligner), then rerun; the "
                "corpus layout + dictionary are ready at "
                f"{mfa_dir} / {dict_fn}")
        n_jobs = int(os.getenv("N_PROC", os.cpu_count() or 1))
        cmd = [mfa_bin, "train", "--clean", "-j", str(n_jobs),
               mfa_dir, dict_fn, tg_dir]
        print("| running:", " ".join(cmd))
        subprocess.check_call(cmd)
        print(f"| wrote TextGrids at {tg_dir}")
        return

    if args.command == "binarize":
        import importlib

        # Offline binarization is host work: per-item F0 tracking and
        # GE2E embedding dispatch thousands of tiny ops, which is
        # pathological through a remote-PJRT TPU tunnel (measured: 0
        # items in 15 min tunneled vs ~1 item/s on host CPU). Run the
        # whole phase on the CPU backend unless the recipe opts out.
        if cfg.get("binarize_platform", "cpu") == "cpu":
            import jax
            jax.config.update("jax_platforms", "cpu")
        cls_path = cfg.get("binarizer_cls",
                           "stylesinger_tpu.data.binarize."
                           "StyleSingingBinarizer")
        mod, cls = cls_path.rsplit(".", 1)
        binarizer_cls = getattr(importlib.import_module(mod), cls)
        binarizer_cls(cfg).process()
        return

    if args.command == "train":
        from stylesinger_tpu.data import (
            BucketBatcher, EpochBatches, StyleSingerDataset,
        )
        from stylesinger_tpu.models.stylesinger import StyleSinger
        from stylesinger_tpu.text import build_token_encoder
        from stylesinger_tpu.training.trainer import Trainer

        save_config(cfg, work_dir)
        ph_set = os.path.join(cfg["binary_data_dir"], "phone_set.json")
        encoder = build_token_encoder(ph_set)
        model = StyleSinger(cfg, len(encoder))
        train_ds = StyleSingerDataset(cfg, cfg["train_set_name"])
        valid_ds = StyleSingerDataset(cfg, cfg["valid_set_name"])
        trainer = Trainer(model, cfg, work_dir)

        import jax
        rank, world = jax.process_index(), jax.process_count()

        # finite-but-re-iterable: the per-step loop re-iterates on epoch end
        # (fresh shuffle each pass) and the steps_per_dispatch>1 scan path
        # can materialize exactly one epoch (Trainer._stack_batches)
        train_batches = EpochBatches(train_ds, cfg, rank=rank,
                                     world_size=world)

        def valid_batches():
            bb = BucketBatcher(valid_ds, cfg, shuffle=False,
                               max_tokens=cfg["max_valid_tokens"],
                               max_sentences=cfg["max_valid_sentences"])
            return bb.batches(0)

        from stylesinger_tpu.training.trainer import HostMemoryExceeded
        try:
            trainer.fit(train_batches, valid_batches)
        except HostMemoryExceeded as e:
            print(f"| {e}")
            print("| host-RSS watchdog checkpointed and is exiting 75 "
                  "(restartable, NOT a crash) — rerun with --supervise to "
                  "restart-and-resume automatically")
            raise SystemExit(RESTART_EXIT_CODE)
        return

    if args.command == "test":
        # reference "test" mode (trainer.test() -> test_step/test_end,
        # tasks/StyleSinger/stylesinger.py:156-306): synthesize the test
        # split from the latest checkpoint and dump wavs + meta.csv +
        # result_f0s.npy under <work_dir>/generated_<step>/
        from stylesinger_tpu.data import BucketBatcher, StyleSingerDataset
        from stylesinger_tpu.models.stylesinger import StyleSinger
        from stylesinger_tpu.text import build_token_encoder
        from stylesinger_tpu.training.step import init_state
        from stylesinger_tpu.training.test_runner import TestRunner
        from stylesinger_tpu.training.trainer import Trainer
        from stylesinger_tpu.vocoder_infer import get_vocoder_cls

        ph_set = os.path.join(cfg["binary_data_dir"], "phone_set.json")
        encoder = build_token_encoder(ph_set)
        model = StyleSinger(cfg, len(encoder))
        test_ds = StyleSingerDataset(cfg, cfg["test_set_name"])
        trainer = Trainer(model, cfg, work_dir)
        bb = BucketBatcher(test_ds, cfg, shuffle=False,
                           max_tokens=cfg["max_valid_tokens"],
                           max_sentences=cfg["max_valid_sentences"])
        batches = list(bb.batches(0))
        if trainer.ckpt.latest_step() is None:
            raise SystemExit(
                f"| ERROR: no checkpoint under {work_dir}/ckpt — refusing "
                "to synthesize test artifacts from random weights. Train "
                "first (run.py train) or point --work_dir at a trained "
                "experiment.")
        state = init_state(model, cfg, trainer._numeric(batches[0]),
                           trainer.rng)
        state, step = trainer.ckpt.restore(state)
        print(f"| restored checkpoint step {step}")
        variables = {"params": state.params, "codebook": state.codebook}
        vocoder = get_vocoder_cls(cfg)(cfg)
        runner = TestRunner(model, cfg, vocoder, work_dir,
                            gen_dir_name=str(step))
        gen_dir = runner.run(variables, batches)
        print(f"| wrote {gen_dir}")
        return

    if args.command == "infer":
        from stylesinger_tpu.inference import example_run
        try:
            out = example_run(cfg, out_path=args.out,
                              allow_random=args.allow_random)
        except FileNotFoundError as e:
            raise SystemExit(f"| ERROR: {e}")
        print(f"| wrote {out}")


if __name__ == "__main__":
    main()
