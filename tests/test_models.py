"""Module-level shape/numerics tests with fixed PRNG (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylesinger_tpu.models.common import length_regulator
from stylesinger_tpu.models.hifigan import (
    HifiGanGenerator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
    blocked_phase_cumsum,
)
from stylesinger_tpu.models.style import (
    LocalStyleAdaptor, ProsodyAligner, monotonic_band_attention,
)
from stylesinger_tpu.models.stylesinger import (
    StyleSinger, minmax_denorm_lf0, minmax_norm_lf0,
)
from stylesinger_tpu.models.fs2 import FastSpeech2
from stylesinger_tpu.models.umln import UMLN

KEY = jax.random.PRNGKey(0)
VOCAB = 20


def _batch(tiny_cfg, b=2, tt=8, tm=32, tr=24):
    nm = tiny_cfg["audio_num_mel_bins"]
    k = jax.random.split(KEY, 10)
    tokens = jax.random.randint(k[0], (b, tt), 1, VOCAB)
    mel2ph = jnp.clip(
        jnp.cumsum(jax.random.bernoulli(k[1], 0.25, (b, tm)), axis=-1) + 1,
        None, tt).astype(jnp.int32)
    f0 = jax.random.uniform(k[2], (b, tm), minval=7.0, maxval=9.0)
    uv = jax.random.bernoulli(k[3], 0.2, (b, tm)).astype(jnp.float32)
    return dict(
        txt_tokens=tokens,
        mel2ph=mel2ph,
        spk_embed=jax.random.normal(k[4], (b, 256)),
        emo_embed=jax.random.normal(k[5], (b, 256)),
        ref_mels=jax.random.normal(k[6], (b, tr, nm)) * 0.1 + 1.0,
        ref_f0=jax.random.uniform(k[7], (b, tr), minval=7.0, maxval=9.0),
        f0=f0, uv=uv,
        note=jax.random.randint(k[8], (b, tt), 1, 50),
        note_dur=jax.random.uniform(k[9], (b, tt), minval=0.1, maxval=0.5),
        note_type=jnp.ones((b, tt), jnp.int32),
        mels=jax.random.normal(k[6], (b, tm, nm)) * 0.1 - 2.0,
    )


ALL_RNGS = dict(params=KEY, dropout=KEY, umln=KEY, rq=KEY, diffusion=KEY,
                noise=KEY)


# ------------------------------------------------------------------ UMLN

def test_umln_eval_is_identity(tiny_cfg):
    m = UMLN(hidden_size=32)
    x = jax.random.normal(KEY, (2, 5, 32))
    s = jax.random.normal(KEY, (2, 1, 32))
    params = m.init(ALL_RNGS, x, s, train=False)
    y = m.apply(params, x, s, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_umln_train_perturbs(tiny_cfg):
    m = UMLN(hidden_size=32, p=1.0)
    x = jax.random.normal(KEY, (2, 5, 32))
    s = jax.random.normal(KEY, (2, 1, 32))
    params = m.init(ALL_RNGS, x, s, train=False)
    y = m.apply(params, x, s, train=True, rngs={"umln": jax.random.PRNGKey(7)})
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


# ----------------------------------------------------------------- style

def test_monotonic_band_mask():
    m = np.asarray(monotonic_band_attention(4, 8))  # k = 2
    assert m.shape == (4, 8)
    # query i covers kv [2i-1, 2i+1)
    assert m[1, 1] == 1 and m[1, 2] == 1 and m[1, 4] == 0
    assert (m.sum(-1) >= 1).all()


def test_prosody_aligner_shapes(tiny_cfg):
    b, tq, tk, h = 2, 6, 10, 32
    m = ProsodyAligner(h, num_layers=2, ffn_dim=64)
    src = jax.random.normal(KEY, (b, tq, h))
    style = jax.random.normal(KEY, (b, tk, h))
    src_np = jnp.ones((b, tq))
    sty_np = jnp.ones((b, tk))
    params = m.init(ALL_RNGS, src, style, src_np, sty_np)
    out, gloss, attn = m.apply(params, src, style, src_np, sty_np)
    assert out.shape == (b, tq, h)
    assert attn.shape == (b, 2, tq, tk)
    assert float(gloss) >= 0
    # forcing mode also runs
    out_f, _, _ = m.apply(params, src, style, src_np, sty_np, forcing=True)
    assert out_f.shape == (b, tq, h)


def test_local_style_adaptor(tiny_cfg):
    b, t, h = 2, 16, 32
    m = LocalStyleAdaptor(h, n_codes=8, rq_depth=2)
    mels = jax.random.normal(KEY, (b, t, 80)) * 0.1 + 1.0
    f0 = jax.random.uniform(KEY, (b, t), minval=7.0, maxval=9.0)
    variables = m.init(ALL_RNGS, mels, f0, use_rq=True)
    (style, rq_loss, codes), _ = m.apply(
        variables, mels, f0, use_rq=True, train=True,
        rng=jax.random.PRNGKey(3), mutable=["codebook"])
    assert style.shape == (b, t, h)
    assert codes.shape == (b, t, 2)
    assert float(rq_loss) >= 0
    warm, nl, nc = m.apply(variables, mels, f0, use_rq=False)
    assert warm.shape == (b, t, h) and nl is None and nc is None


# --------------------------------------------------------------- backbone

def test_fastspeech2_train_and_infer(tiny_cfg):
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 48
    m = FastSpeech2(cfg, VOCAB, out_dims=cfg["audio_num_mel_bins"])
    b = _batch(tiny_cfg)
    variables = m.init(ALL_RNGS, b["txt_tokens"], b["mel2ph"],
                       b["spk_embed"], b["f0"], b["uv"], infer=False)
    ret = m.apply(variables, b["txt_tokens"], b["mel2ph"], b["spk_embed"],
                  b["f0"], b["uv"], infer=False,
                  rngs={"dropout": KEY})
    assert ret["mel_out"].shape == (2, 32, cfg["audio_num_mel_bins"])
    assert ret["dur"].shape == b["txt_tokens"].shape
    assert ret["pitch_pred"].shape == (2, 32, 2)
    ret_i = m.apply(variables, b["txt_tokens"], None, b["spk_embed"],
                    None, None, infer=True, max_frames=48)
    assert ret_i["mel_out"].shape == (2, 48, cfg["audio_num_mel_bins"])
    assert ret_i["mel2ph"].shape == (2, 48)


# ------------------------------------------------------------- stylesinger

@pytest.fixture(scope="module")
def ss_setup(tiny_cfg):
    cfg = dict(tiny_cfg)
    cfg["max_frames"] = 48
    m = StyleSinger(cfg, VOCAB)
    b = _batch(tiny_cfg)
    # in training the style reference IS the ground-truth mel (same clip),
    # and run_diffsinger uses it as the diffusion target
    variables = m.init(
        ALL_RNGS, b["txt_tokens"], b["mel2ph"], b["spk_embed"],
        b["emo_embed"], b["mels"], b["f0"], b["f0"], b["uv"],
        b["note"], b["note_dur"], b["note_type"],
        infer=False, use_rq=True, forcing=False, use_diff=True)
    return m, b, variables


def _apply_train(m, b, variables, **flags):
    return m.apply(
        variables, b["txt_tokens"], b["mel2ph"], b["spk_embed"],
        b["emo_embed"], b["mels"], b["f0"], b["f0"], b["uv"],
        b["note"], b["note_dur"], b["note_type"], infer=False,
        rngs={k: jax.random.PRNGKey(i) for i, k in enumerate(
            ["dropout", "umln", "rq", "diffusion"])},
        mutable=["codebook"], **flags)


def test_stylesinger_train_full(ss_setup):
    m, b, variables = ss_setup
    ret, updates = _apply_train(m, b, variables, use_rq=True, forcing=False,
                                use_diff=True)
    assert ret["mel_out"].shape == (2, 32, m.cfg["audio_num_mel_bins"])
    for k in ("rq_loss", "gloss", "mdiff1", "gdiff1", "mdiff2", "gdiff2",
              "diff_loss"):
        assert np.isfinite(float(ret[k])), k
    assert "codebook" in updates


def test_stylesinger_train_warmup_phase(ss_setup):
    m, b, variables = ss_setup
    ret, _ = _apply_train(m, b, variables, use_rq=False, forcing=True,
                          use_diff=False)
    assert "rq_loss" not in ret
    assert "diff_loss" not in ret
    assert np.isfinite(float(ret["gloss"]))


def test_stylesinger_infer(ss_setup):
    m, b, variables = ss_setup
    ret = m.apply(
        variables, b["txt_tokens"], None, b["spk_embed"], b["emo_embed"],
        b["ref_mels"], b["ref_f0"], None, None,
        b["note"], b["note_dur"], b["note_type"],
        infer=True, use_diff=True, max_frames=48,
        rngs={"diffusion": KEY, "rq": KEY})
    assert ret["mel_out"].shape == (2, 48, m.cfg["audio_num_mel_bins"])
    assert ret["f0_denorm"].shape == (2, 48)
    assert np.isfinite(np.asarray(ret["mel_out"])).all()


# ----------------------------------------------------------------- hifigan

def test_blocked_phase_cumsum_matches_naive():
    rad = jax.random.uniform(KEY, (1, 64, 3)) * 0.02
    blocked = np.asarray(blocked_phase_cumsum(rad, 16))
    naive = np.cumsum(np.asarray(rad), axis=1)
    np.testing.assert_allclose(
        np.sin(2 * np.pi * blocked), np.sin(2 * np.pi * naive), atol=1e-4)


def test_hifigan_generator(tiny_cfg):
    m = HifiGanGenerator(tiny_cfg)
    mel = jax.random.normal(KEY, (1, 20, 80))
    f0 = jnp.full((1, 20), 220.0)
    hop = int(np.prod(tiny_cfg["upsample_rates"]))
    variables = m.init(ALL_RNGS, mel, f0)
    wav = m.apply(variables, mel, f0, rngs={"noise": KEY})
    assert wav.shape == (1, 20 * hop)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_hifigan_blocked_mrf_matches_monolithic(tiny_cfg):
    """Overlap-save MRF blocking must reproduce the monolithic generator
    exactly (same params, only float reassociation differs)."""
    cfg = dict(tiny_cfg)
    cfg.update(upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
               upsample_initial_channel=64, mrf_block=0)
    mel = jax.random.normal(KEY, (2, 64, 80))
    f0 = jnp.full((2, 64), 220.0)
    mono = HifiGanGenerator(cfg)
    variables = mono.init(ALL_RNGS, mel, f0)
    w_mono = mono.apply(variables, mel, f0, rngs={"noise": KEY})
    cfg_b = dict(cfg, mrf_block=128)  # triggers on the last three stages
    w_blk = HifiGanGenerator(cfg_b).apply(variables, mel, f0,
                                          rngs={"noise": KEY})
    np.testing.assert_allclose(np.asarray(w_blk), np.asarray(w_mono),
                               atol=3e-5)


def test_discriminators(tiny_cfg):
    wav = jax.random.normal(KEY, (2, 1024)) * 0.1
    mpd = MultiPeriodDiscriminator()
    v = mpd.init(KEY, wav)
    outs, feats = mpd.apply(v, wav)
    assert len(outs) == 5 and len(feats) == 5
    msd = MultiScaleDiscriminator()
    v = msd.init(KEY, wav)
    outs, feats = msd.apply(v, wav)
    assert len(outs) == 3


# ------------------------------------------------------------------ misc

def test_minmax_roundtrip():
    x = jnp.asarray([6.5, 8.0, 9.9])
    np.testing.assert_allclose(
        np.asarray(minmax_denorm_lf0(minmax_norm_lf0(x))), np.asarray(x),
        rtol=1e-6)


def test_length_regulator_static():
    dur = jnp.asarray([[2, 3, 1]])
    pad = jnp.zeros((1, 3))
    m = np.asarray(length_regulator(dur, pad, 10))
    np.testing.assert_array_equal(m[0], [1, 1, 2, 2, 2, 3, 0, 0, 0, 0])


def test_stylesinger_prodiff_decoder(tiny_cfg):
    cfg = dict(tiny_cfg)
    cfg.update(decoder="prodiff", max_frames=48)
    m = StyleSinger(cfg, VOCAB)
    b = _batch(tiny_cfg)
    variables = m.init(
        ALL_RNGS, b["txt_tokens"], b["mel2ph"], b["spk_embed"],
        b["emo_embed"], b["mels"], b["f0"], b["f0"], b["uv"],
        b["note"], b["note_dur"], b["note_type"], infer=False)
    ret, _ = m.apply(
        variables, b["txt_tokens"], b["mel2ph"], b["spk_embed"],
        b["emo_embed"], b["mels"], b["f0"], b["f0"], b["uv"],
        b["note"], b["note_dur"], b["note_type"], infer=False,
        rngs={k: jax.random.PRNGKey(i) for i, k in enumerate(
            ["dropout", "umln", "rq", "diffusion"])},
        mutable=["codebook"])
    assert ret["mel_out"].shape == (2, 32, cfg["audio_num_mel_bins"])
    ret_i = m.apply(
        variables, b["txt_tokens"], None, b["spk_embed"], b["emo_embed"],
        b["ref_mels"], b["ref_f0"], None, None,
        b["note"], b["note_dur"], b["note_type"],
        infer=True, max_frames=48, rngs={"diffusion": KEY, "rq": KEY})
    assert ret_i["mel_out"].shape == (2, 48, cfg["audio_num_mel_bins"])
    assert np.isfinite(np.asarray(ret_i["mel_out"])).all()


def test_plms_sampler_matches_full_roughly(tiny_cfg):
    """PLMS with speedup=2 should land near the full sampler's output
    distribution (same conditioning, shared coarse input)."""
    from stylesinger_tpu.models import diffusion as diff

    sched = diff.make_schedule(8, 0.06, "linear")
    coarse = jax.random.normal(KEY, (1, 16, 8)) * 0.2

    def denoise_fn(x, t):
        return 0.1 * x  # a fixed pseudo-denoiser

    full = diff.sample_shallow(denoise_fn, sched, coarse,
                               jax.random.PRNGKey(0), 8)
    fast = diff.sample_shallow_plms(denoise_fn, sched, coarse,
                                    jax.random.PRNGKey(0), 8, 2)
    assert fast.shape == full.shape
    assert np.isfinite(np.asarray(fast)).all()
    # same order of magnitude (deterministic PLMS vs stochastic ancestral)
    assert np.abs(np.asarray(fast)).mean() < \
        5 * np.abs(np.asarray(full)).mean() + 1.0


def test_cat_q_posterior_strided_reduces_to_single_step():
    """With t_prev = t-1 the strided categorical posterior must equal the
    reference one-step posterior exactly."""
    from stylesinger_tpu.models import diffusion as diff

    sched = diff.make_schedule(8, 0.06, "linear")
    k1, k2 = jax.random.split(KEY)
    log_x0 = jax.nn.log_softmax(jax.random.normal(k1, (2, 2, 16)), axis=1)
    log_xt = diff.index_to_log_onehot(
        jax.random.randint(k2, (2, 16), 0, 2), 2)
    for tval in (1, 4, 7):
        t = jnp.full((2,), tval, jnp.int32)
        ref = diff.cat_q_posterior(sched, log_x0, log_xt, t, 2)
        strided = diff.cat_q_posterior_strided(sched, log_x0, log_xt, t,
                                               t - 1, 2)
        np.testing.assert_allclose(np.asarray(strided), np.asarray(ref),
                                   atol=1e-5)


def test_gm_dual_strided_sampler(tiny_cfg):
    """Strided GM sampling (f0_speedup>1) lands near the full dual chain:
    finite f0 inside the clip bounds, binary uv, comparable magnitudes."""
    from stylesinger_tpu.models import diffusion as diff

    sched = diff.make_schedule(8, 0.06, "linear")

    def fn(z, uv, t):
        return jnp.concatenate(
            [0.1 * z, jnp.zeros(z.shape[:2] + (2,))], axis=-1)

    full = diff.sample_gm_dual(fn, fn, sched, 16, 1, jax.random.PRNGKey(0))
    fast = diff.sample_gm_dual(fn, fn, sched, 16, 1, jax.random.PRNGKey(0),
                               speedup=3)
    for (f0f, uvf), (f0s, uvs) in zip(full, fast):
        assert f0s.shape == f0f.shape and uvs.shape == uvf.shape
        assert np.isfinite(np.asarray(f0s)).all()
        assert set(np.unique(np.asarray(uvs))) <= {0.0, 1.0}
        assert np.abs(np.asarray(f0s)).max() <= 1.0 + 1e-5  # clip respected
    # x0-landing: magnitudes in the same range as the full sampler
    assert np.abs(np.asarray(fast[0][0])).mean() < \
        5 * np.abs(np.asarray(full[0][0])).mean() + 1.0


def test_stylesinger_infer_f0_speedup(ss_setup):
    """End-to-end inference with the strided F0 sampler enabled."""
    m, b, variables = ss_setup
    m2 = type(m)(dict(m.cfg, f0_speedup=4), m.vocab_size)
    ret = m2.apply(
        variables, b["txt_tokens"], None, b["spk_embed"], b["emo_embed"],
        b["ref_mels"], b["ref_f0"], None, None, b["note"], b["note_dur"],
        b["note_type"], infer=True, use_diff=True, max_frames=48,
        rngs={"diffusion": KEY, "rq": KEY})
    assert np.isfinite(np.asarray(ret["mel_out"])).all()
    assert np.isfinite(np.asarray(ret["f0_denorm"])).all()


def test_fs2_pitch_type_variants(tiny_cfg):
    """The reference's cwt and ph pitch variants (fs2.py:185-231)."""
    b = _batch(tiny_cfg)
    for ptype in ("cwt", "ph"):
        cfg = dict(tiny_cfg)
        cfg.update(max_frames=48, pitch_type=ptype, pitch_norm="log")
        m = FastSpeech2(cfg, VOCAB, out_dims=cfg["audio_num_mel_bins"])
        variables = m.init(ALL_RNGS, b["txt_tokens"], b["mel2ph"],
                           b["spk_embed"], None, None, infer=False)
        ret = m.apply(variables, b["txt_tokens"], b["mel2ph"],
                      b["spk_embed"], None, None, infer=True, max_frames=32)
        assert ret["mel_out"].shape == (2, 32, cfg["audio_num_mel_bins"])
        assert np.isfinite(np.asarray(ret["mel_out"])).all(), ptype
        if ptype == "cwt":
            assert ret["cwt"].shape[-1] == 11


def test_legacy_denoisers(tiny_cfg):
    from stylesinger_tpu.models.diffnet import F0DiffNet, MDiffNet
    b, t, h = 2, 12, 32
    cond = jax.random.normal(KEY, (b, t, h))
    nonpadding = jnp.ones((b, t))
    f0 = jax.random.normal(KEY, (b, t, 1))
    step = jnp.asarray([1, 2])
    m = F0DiffNet(residual_layers=2, residual_channels=16)
    v = m.init(KEY, f0, step, cond, nonpadding)
    out = m.apply(v, f0, step, cond, nonpadding)
    assert out.shape == (b, t, 1)
    uv = jnp.zeros((b, t), jnp.int32)
    m2 = MDiffNet(residual_layers=2, residual_channels=16)
    v2 = m2.init(KEY, uv, step, cond, nonpadding)
    out2 = m2.apply(v2, uv, step, cond, nonpadding)
    assert out2.shape == (b, t, 2)


def test_group_hidden_by_segs():
    from stylesinger_tpu.dsp.align import group_hidden_by_segs
    h = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))
    segs = jnp.asarray([[1, 1, 2, 2, 2, 0]])
    pooled, cnt = group_hidden_by_segs(h, segs, 3)
    np.testing.assert_allclose(np.asarray(pooled[0, 0]), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(pooled[0, 1]), [6.0, 7.0])
    np.testing.assert_allclose(np.asarray(cnt[0]), [2, 3, 0])


def test_local_style_adaptor_phone_level(tiny_cfg):
    from stylesinger_tpu.models.style import LocalStyleAdaptor
    b, t, h = 2, 16, 32
    m = LocalStyleAdaptor(h, n_codes=8, rq_depth=2)
    mels = jax.random.normal(KEY, (b, t, 80)) * 0.1 + 1.0
    f0 = jax.random.uniform(KEY, (b, t), minval=7.0, maxval=9.0)
    mel2ph = jnp.asarray(np.minimum(np.arange(t)[None].repeat(b, 0) // 4 + 1,
                                    4).astype(np.int32))
    variables = m.init(ALL_RNGS, mels, f0, mel2ph=mel2ph, use_rq=True)
    style, rq_loss, codes = m.apply(variables, mels, f0, mel2ph=mel2ph,
                                    use_rq=True)
    # pooled to the static phone-axis bound (= mel2ph.shape[1])
    assert style.shape == (b, t, h)
    assert np.isfinite(np.asarray(style)).all()
    assert float(rq_loss) >= 0

def test_stylesinger_fft_denoiser_decoder(tiny_cfg):
    """diff_decoder_type: fft — the candidate_decoder.py FFT denoiser swaps
    in for the WaveNet postdiff (reference DIFF_DECODERS registry,
    stylesinger.py:38-40 + modules/diff/candidate_decoder.py:35-95)."""
    cfg = dict(tiny_cfg)
    cfg.update(decoder="diffsinger", diff_decoder_type="fft", max_frames=48)
    m = StyleSinger(cfg, VOCAB)
    b = _batch(tiny_cfg)
    variables = m.init(
        ALL_RNGS, b["txt_tokens"], b["mel2ph"], b["spk_embed"],
        b["emo_embed"], b["mels"], b["f0"], b["f0"], b["uv"],
        b["note"], b["note_dur"], b["note_type"], infer=False)
    ret, _ = m.apply(
        variables, b["txt_tokens"], b["mel2ph"], b["spk_embed"],
        b["emo_embed"], b["mels"], b["f0"], b["f0"], b["uv"],
        b["note"], b["note_dur"], b["note_type"], infer=False,
        rngs={k: jax.random.PRNGKey(i) for i, k in enumerate(
            ["dropout", "umln", "rq", "diffusion"])},
        mutable=["codebook"])
    assert np.isfinite(float(ret["diff_loss"]))
    ret_i = m.apply(
        variables, b["txt_tokens"], None, b["spk_embed"], b["emo_embed"],
        b["ref_mels"], b["ref_f0"], None, None,
        b["note"], b["note_dur"], b["note_type"],
        infer=True, max_frames=48, rngs={"diffusion": KEY, "rq": KEY})
    assert ret_i["mel_out"].shape == (2, 48, cfg["audio_num_mel_bins"])
    assert np.isfinite(np.asarray(ret_i["mel_out"])).all()


def test_fft_denoiser_dropout_gated_by_deterministic():
    """ADVICE r1: the FFT denoiser's dropout must be live in training mode
    (reference candidate_decoder.py:80) and off at inference."""
    from stylesinger_tpu.models.diffnet import FFTDenoiser

    net = FFTDenoiser(in_dims=8, hidden_size=16, residual_channels=16,
                      num_layers=1, kernel_size=3, num_heads=2, dropout=0.5)
    x = jnp.ones((1, 12, 8))
    t = jnp.zeros((1,), jnp.int32)
    cond = jnp.ones((1, 12, 16))
    v = net.init({"params": KEY, "dropout": KEY}, x, t, cond)
    det = net.apply(v, x, t, cond, deterministic=True)
    a = net.apply(v, x, t, cond, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    b = net.apply(v, x, t, cond, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    # deterministic path is rng-free and repeatable; train path varies
    np.testing.assert_array_equal(np.asarray(det),
                                  np.asarray(net.apply(v, x, t, cond)))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_dpmpp_exact_for_point_mass_oracle():
    """DPM-Solver++(2M) algebra check: when the denoiser is the exact
    eps-oracle of a point-mass data distribution (eps = (x_t - a_t x0*)
    / s_t), the data prediction is exact at every grid point, so ANY
    correct solver must land exactly on x0* — including the final
    sigma->0 step. Validates the update coefficients end-to-end."""
    from stylesinger_tpu.models import diffusion as diff

    sched = diff.make_schedule(64, 0.06, "linear")
    x0_star = jnp.asarray(
        np.random.default_rng(0).uniform(-0.8, 0.8, (2, 12, 8)), jnp.float32)
    a = jnp.asarray(sched.sqrt_alphas_cumprod)
    s = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def oracle(x, t):
        a_t = a[t].reshape(-1, 1, 1)
        s_t = s[t].reshape(-1, 1, 1)
        return (x - a_t * x0_star) / s_t

    for n in (1, 2, 4, 8):
        out = diff.sample_shallow_dpmpp(oracle, sched, jnp.zeros_like(
            x0_star), jax.random.PRNGKey(3), 64, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0_star),
                                   atol=2e-4, err_msg=f"n_steps={n}")


def test_dpmpp_converges_to_probability_flow():
    """Self-convergence on a nontrivial linear-Gaussian denoiser: the
    8-call solution must be close to the 48-call one (both integrate the
    same probability-flow ODE; the coarse grid's error must be small),
    and strictly closer than the 2-call one (order sanity)."""
    from stylesinger_tpu.models import diffusion as diff

    sched = diff.make_schedule(64, 0.06, "linear")
    mu = 0.3
    s2 = 0.05 ** 2
    a = jnp.asarray(sched.sqrt_alphas_cumprod)
    s = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def gauss_denoiser(x, t):
        # exact eps posterior for x0 ~ N(mu, s2 I)
        a_t = a[t].reshape(-1, 1, 1)
        s_t = s[t].reshape(-1, 1, 1)
        x0_hat = (a_t * s2 * x + (s_t ** 2) * mu) / \
            (a_t ** 2 * s2 + s_t ** 2)
        return (x - a_t * x0_hat) / s_t

    coarse = jax.random.normal(KEY, (1, 16, 8)) * 0.2 + mu
    rng = jax.random.PRNGKey(11)
    ref = diff.sample_shallow_dpmpp(gauss_denoiser, sched, coarse, rng,
                                    64, 48)
    mid = diff.sample_shallow_dpmpp(gauss_denoiser, sched, coarse, rng,
                                    64, 8)
    lo = diff.sample_shallow_dpmpp(gauss_denoiser, sched, coarse, rng,
                                   64, 2)
    err_mid = float(jnp.abs(mid - ref).mean())
    err_lo = float(jnp.abs(lo - ref).mean())
    assert err_mid < 0.02, err_mid
    assert err_mid < err_lo, (err_mid, err_lo)


def test_stylesinger_infer_dpm_steps(ss_setup):
    """End-to-end inference through the DPM-Solver++ mel sampler."""
    m, b, variables = ss_setup
    m2 = type(m)(dict(m.cfg, dpm_steps=3), m.vocab_size)
    ret = m2.apply(
        variables, b["txt_tokens"], None, b["spk_embed"], b["emo_embed"],
        b["ref_mels"], b["ref_f0"], None, None, b["note"], b["note_dur"],
        b["note_type"], infer=True, use_diff=True, max_frames=48,
        rngs={"diffusion": KEY, "rq": KEY})
    assert np.isfinite(np.asarray(ret["mel_out"])).all()


def test_hifigan_mrf_pallas_matches_flax(tiny_cfg):
    """mrf_pallas=True (fused Pallas MRF stages) must reproduce the flax
    blocked path from the SAME variables — the param trees are declared
    identically, so checkpoints/converters serve both paths."""
    cfg = dict(tiny_cfg)
    cfg.update(upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
               upsample_initial_channel=64, mrf_block=128)
    mel = jax.random.normal(KEY, (2, 64, 80))
    f0 = jnp.full((2, 64), 220.0)
    flax_gen = HifiGanGenerator(cfg)
    variables = flax_gen.init(ALL_RNGS, mel, f0)
    w_flax = flax_gen.apply(variables, mel, f0, rngs={"noise": KEY})

    cfg_p = dict(cfg, mrf_pallas=True)
    pallas_gen = HifiGanGenerator(cfg_p)
    v_p = pallas_gen.init(ALL_RNGS, mel, f0)
    assert jax.tree_util.tree_structure(v_p) == \
        jax.tree_util.tree_structure(variables)
    w_pallas = pallas_gen.apply(variables, mel, f0, rngs={"noise": KEY})
    np.testing.assert_allclose(np.asarray(w_pallas), np.asarray(w_flax),
                               atol=3e-5)
