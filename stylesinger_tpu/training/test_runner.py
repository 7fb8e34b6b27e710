"""Test-split synthesis runner ("test" = batch inference + artifact dump).

Parity target: ``StyleSingerTask.test_step``/``test_end``
(``tasks/StyleSinger/stylesinger.py:156-306`` in AaronZ345/StyleSinger,
``tasks/tts/tts_base.py:285-290``): run the model in inference mode over
the test split, vocode, and write ``<gen_dir>/wavs/*.wav`` (+ ground-truth
resynthesis when ``save_gt``), ``result_f0s.npy`` and ``meta.csv``.
"""

from __future__ import annotations

import csv
import os
from typing import Any, Dict, Iterable, Optional

import numpy as np

from stylesinger_tpu.dsp.mel import save_wav
from stylesinger_tpu.dsp.pitch import denorm_f0


class TestRunner:
    def __init__(self, model, cfg: Any, vocoder, work_dir: str,
                 gen_dir_name: str = ""):
        self.model = model
        self.cfg = cfg
        self.vocoder = vocoder
        self.gen_dir = os.path.join(
            work_dir, f"generated_{gen_dir_name}" if gen_dir_name
            else "generated")
        os.makedirs(os.path.join(self.gen_dir, "wavs"), exist_ok=True)
        self._jit = None

    def _forward(self, variables, batch, rng, max_frames: int):
        import jax

        if self._jit is None:
            def fwd(variables, batch, rng):
                ret = self.model.apply(
                    variables, batch["txt_tokens"], None,
                    batch["spk_embed"], batch.get("emo_embed"),
                    batch["mels"], batch["f0"], None, None,
                    batch["notes"], batch["note_durs"],
                    batch["note_types"], infer=True, use_diff=True,
                    max_frames=max_frames,
                    rngs={"diffusion": rng, "rq": rng})
                return ret["mel_out"], ret["f0_denorm"], ret["mel2ph"]

            self._jit = jax.jit(fwd)
        return self._jit(variables, batch, rng)

    def run(self, variables, batches: Iterable[Dict],
            rng: Optional[Any] = None) -> str:
        """Synthesize every test batch; returns the generation dir."""
        import jax
        import jax.numpy as jnp

        c = self.cfg
        rng = jax.random.PRNGKey(c["seed"]) if rng is None else rng
        rows = []
        f0s = []
        idx = 0
        for batch in batches:
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype != object}
            mel, f0_denorm, mel2ph = self._forward(
                variables, jb, jax.random.fold_in(rng, idx),
                batch["mels"].shape[1])
            mel = np.asarray(mel)
            f0_denorm = np.asarray(f0_denorm)
            n_frames = np.asarray((mel2ph > 0).sum(-1))
            for b in range(mel.shape[0]):
                if batch.get("nsamples") is not None and \
                        b >= int(batch["nsamples"]):
                    break
                t = int(n_frames[b])
                if t == 0:
                    continue
                name = f"item_{idx:04d}"
                wav = self.vocoder.spec2wav(mel[b, :t], f0=f0_denorm[b, :t])
                save_wav(wav, os.path.join(self.gen_dir, "wavs",
                                           f"{name}.wav"),
                         c["audio_sample_rate"])
                if c.get("save_gt", True):
                    gt_mel = np.asarray(batch["mels"][b])
                    gt_t = int((np.abs(gt_mel).sum(-1) > 0).sum())
                    gt_f0 = denorm_f0(
                        np.asarray(batch["f0"][b, :gt_t]),
                        np.asarray(batch["uv"][b, :gt_t]),
                        pitch_norm=c["pitch_norm"], f0_mean=c["f0_mean"],
                        f0_std=c["f0_std"])
                    wav_gt = self.vocoder.spec2wav(gt_mel[:gt_t],
                                                   f0=np.asarray(gt_f0))
                    save_wav(wav_gt, os.path.join(
                        self.gen_dir, "wavs", f"{name}_gt.wav"),
                        c["audio_sample_rate"])
                f0s.append(f0_denorm[b, :t])
                rows.append({"item_name": name, "n_frames": t,
                             "wav_fn": f"wavs/{name}.wav"})
                idx += 1
        np.save(os.path.join(self.gen_dir, "result_f0s.npy"),
                np.asarray(f0s, dtype=object), allow_pickle=True)
        with open(os.path.join(self.gen_dir, "meta.csv"), "w",
                  newline="") as f:
            w = csv.DictWriter(f, fieldnames=["item_name", "n_frames",
                                              "wav_fn"])
            w.writeheader()
            w.writerows(rows)
        return self.gen_dir
