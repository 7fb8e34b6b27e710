"""AOT serving export: freeze the zero-shot synthesis graph to StableHLO.

The reference serves by importing its full Python/torch model zoo at
inference time (``inference/StyleSinger.py:21-62`` rebuilds the module
tree and loads a ``.ckpt`` per process). A TPU-native production path
should not need the model code at all: ``jax.export`` lowers the jitted
synthesis function (acoustic model with its ``lax.scan`` diffusion
samplers + HiFi-GAN NSF vocoder) once, to a *versioned, self-contained
StableHLO artifact* that any PJRT runtime — Python or C++ — can execute
on the target platform without this package installed.

Properties of the artifact:
- static shapes (one artifact per serving bucket, matching the
  bucket-aware batcher in ``inference.py::infer_batch``);
- weights are call arguments, not baked constants, so one artifact
  serves every checkpoint of the same architecture;
- multi-platform: one artifact can carry lowerings for both ``tpu``
  and ``cpu`` (canary/debug hosts), selected at load time;
- stable across jax versions within the export calling-convention
  window (jax.export's compatibility guarantee).

Usage:
    fn = make_synthesize_fn(cfg, vocab_size, max_frames=1024)
    blob = export_synthesizer(cfg, vocab_size, batch=1, t_txt=96,
                              t_ref=512, max_frames=1024)
    save_synthesizer(blob, "stylesinger_b1.shlo")
    ...
    exported = load_synthesizer("stylesinger_b1.shlo")
    wav, mel, f0, mel2ph = exported.call(variables, voc_vars, batch, rng)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple


def make_synthesize_fn(cfg, vocab_size: int,
                       max_frames: Optional[int] = None) -> Callable:
    """The full zero-shot synthesis step as one pure function:
    (variables, voc_variables, batch, rng) -> (wav, mel, f0_denorm,
    mel2ph). Mirrors ``StyleSingerInfer.forward_model``'s jitted body
    (inference.py) without any object state."""
    from stylesinger_tpu.models.hifigan import HifiGanGenerator
    from stylesinger_tpu.models.stylesinger import StyleSinger

    model = StyleSinger(cfg, vocab_size)
    vocoder = HifiGanGenerator(cfg)
    frames = max_frames or cfg["max_frames"]

    def synthesize(variables, voc_variables, batch, rng):
        ret = model.apply(
            variables, batch["txt_tokens"], None, batch["spk_embed"],
            batch["emo_embed"], batch["ref_mels"], batch["ref_f0"],
            None, None, batch["note"], batch["note_dur"],
            batch["note_type"], infer=True, use_diff=True,
            max_frames=frames, rngs={"diffusion": rng, "rq": rng})
        wav = vocoder.apply(voc_variables, ret["mel_out"],
                            ret["f0_denorm"], rngs={"noise": rng})
        return wav, ret["mel_out"], ret["f0_denorm"], ret["mel2ph"]

    return synthesize


def _example_batch(cfg, vocab_size: int, batch: int, t_txt: int,
                   t_ref: int):
    import jax
    import numpy as np

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    return dict(
        txt_tokens=jax.random.randint(ks[0], (batch, t_txt), 1, vocab_size),
        spk_embed=jax.random.normal(ks[1], (batch, 256)),
        emo_embed=jax.random.normal(ks[2], (batch, 256)),
        ref_mels=jax.random.normal(
            ks[3], (batch, t_ref, cfg["audio_num_mel_bins"])) * 0.5 - 2.0,
        ref_f0=jax.random.uniform(ks[4], (batch, t_ref), minval=7.0,
                                  maxval=9.0),
        note=jax.random.randint(ks[5], (batch, t_txt), 40, 80),
        note_dur=jax.random.uniform(ks[6], (batch, t_txt), minval=0.08,
                                    maxval=0.5),
        note_type=np.ones((batch, t_txt), np.int32),
    )


def _init_variables(cfg, vocab_size: int, batch: int, t_txt: int,
                    t_ref: int):
    """Random variables with the right pytree structure (init must trace
    the training path — inference-path init creates params inside
    lax.scan and leaks tracers)."""
    import jax
    import jax.numpy as jnp

    from stylesinger_tpu.models.hifigan import HifiGanGenerator
    from stylesinger_tpu.models.stylesinger import StyleSinger

    model = StyleSinger(cfg, vocab_size)
    vocoder = HifiGanGenerator(cfg)
    i = _example_batch(cfg, vocab_size, batch, t_txt, t_ref)
    rngs = {k: jax.random.PRNGKey(n) for n, k in enumerate(
        ["params", "dropout", "umln", "rq", "diffusion", "noise"])}
    variables = model.init(
        rngs, i["txt_tokens"], jnp.ones((batch, t_ref), jnp.int32),
        i["spk_embed"], i["emo_embed"], i["ref_mels"], i["ref_f0"],
        jnp.full((batch, t_ref), 8.0), jnp.zeros((batch, t_ref)),
        i["note"], i["note_dur"], i["note_type"], infer=False,
        use_rq=True, forcing=False, use_diff=True)
    voc_vars = vocoder.init(
        {"params": rngs["params"], "noise": rngs["noise"]},
        jnp.zeros((batch, 16, cfg["audio_num_mel_bins"])),
        jnp.full((batch, 16), 200.0))
    return variables, voc_vars, i


def export_synthesizer(cfg, vocab_size: int, *, batch: int = 1,
                       t_txt: int = 96, t_ref: int = 512,
                       max_frames: Optional[int] = None,
                       platforms: Optional[Sequence[str]] = None,
                       variables=None, voc_variables=None):
    """Lower the synthesis function to a ``jax.export.Exported`` for the
    given serving bucket (batch, t_txt, t_ref → max_frames).

    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` for a dual-platform artifact. When ``variables``
    are omitted, random weights of the right structure are used purely
    as *shape* templates (weights remain call arguments)."""
    import jax
    from jax import export as jexport

    if variables is None or voc_variables is None:
        variables, voc_variables, example = _init_variables(
            cfg, vocab_size, batch, t_txt, t_ref)
    else:
        example = _example_batch(cfg, vocab_size, batch, t_txt, t_ref)

    fn = make_synthesize_fn(cfg, vocab_size, max_frames)
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                       jax.numpy.asarray(x).dtype),
        (variables, voc_variables, example, jax.random.PRNGKey(0)))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jexport.export(jax.jit(fn), **kwargs)(*specs)


def save_synthesizer(exported, path: str) -> str:
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_synthesizer(path: str):
    """Deserialize an exported synthesizer; run via ``.call(*args)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
