"""AOT serving export: StableHLO artifact roundtrip on the tiny config."""

import os

import jax
import numpy as np

from stylesinger_tpu.config import tiny_test_config


def test_export_roundtrip(tmp_path):
    """Export -> serialize -> deserialize -> call must exactly match the
    live jitted function (same weights, same rng), proving the artifact
    is a faithful freeze of the synthesis graph."""
    from stylesinger_tpu.serving import (
        export_synthesizer, load_synthesizer, make_synthesize_fn,
        save_synthesizer,
    )
    from stylesinger_tpu.serving.export import _init_variables

    cfg = tiny_test_config(max_frames=32)
    vocab, b, t_txt, t_ref = 12, 1, 6, 24
    variables, voc_vars, batch = _init_variables(cfg, vocab, b, t_txt,
                                                 t_ref)
    rng = jax.random.PRNGKey(7)

    exported = export_synthesizer(
        cfg, vocab, batch=b, t_txt=t_txt, t_ref=t_ref, max_frames=32,
        variables=variables, voc_variables=voc_vars)
    path = save_synthesizer(exported, str(tmp_path / "tiny.shlo"))
    assert os.path.getsize(path) > 1000

    loaded = load_synthesizer(path)
    wav_a, mel_a, f0_a, mel2ph_a = loaded.call(variables, voc_vars, batch,
                                               rng)

    live = jax.jit(make_synthesize_fn(cfg, vocab, 32))
    wav_b, mel_b, f0_b, mel2ph_b = live(variables, voc_vars, batch, rng)

    np.testing.assert_allclose(np.asarray(wav_a), np.asarray(wav_b),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mel_a), np.asarray(mel_b),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mel2ph_a),
                                  np.asarray(mel2ph_b))
    assert np.isfinite(np.asarray(wav_a)).all()


def test_export_weights_are_arguments(tmp_path):
    """Different weights through the SAME artifact give different audio —
    the export must not bake parameters in as constants."""
    from stylesinger_tpu.serving import export_synthesizer
    from stylesinger_tpu.serving.export import _init_variables

    cfg = tiny_test_config(max_frames=32)
    vocab, b, t_txt, t_ref = 12, 1, 6, 24
    variables, voc_vars, batch = _init_variables(cfg, vocab, b, t_txt,
                                                 t_ref)
    exported = export_synthesizer(
        cfg, vocab, batch=b, t_txt=t_txt, t_ref=t_ref, max_frames=32,
        variables=variables, voc_variables=voc_vars)
    rng = jax.random.PRNGKey(7)
    out1 = exported.call(variables, voc_vars, batch, rng)
    v2 = jax.tree.map(lambda x: x * 1.05 if x.dtype.kind == "f" else x,
                      variables)
    out2 = exported.call(v2, voc_vars, batch, rng)
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out2[1]))
