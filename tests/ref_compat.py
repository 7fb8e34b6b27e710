"""Import harness for the reference PyTorch modules (numerical parity).

The reference at /root/reference is used *read-only* as a numerical golden:
we instantiate its torch modules with random weights, convert the
state_dict with stylesinger_tpu.convert, and compare module outputs.
Missing heavy deps (librosa, matplotlib, ...) are stubbed — the model
modules only need torch/numpy.
"""

from __future__ import annotations

import os
import sys
import types

# resolvable via env so the suite is not coupled to this machine's layout
_REF = os.environ.get("STYLESINGER_REF_ROOT", "/root/reference")
REF_ROOT = _REF


def ref_path(*parts: str) -> str:
    """Path under the reference checkout (env STYLESINGER_REF_ROOT)."""
    return os.path.join(_REF, *parts)


def require_ref_file(*parts: str) -> str:
    """ref_path(...) or pytest.skip when the reference tree is absent."""
    import pytest
    p = ref_path(*parts)
    if not os.path.exists(p):
        pytest.skip(f"reference file {p} not available "
                    "(set STYLESINGER_REF_ROOT)")
    return p
_STUBS = ["chardet", "matplotlib", "matplotlib.pyplot", "librosa",
          "numba", "pyloudnorm", "webrtcvad", "tqdm", "pycwt",
          "parselmouth", "textgrid", "pandas", "sklearn"]


def setup_reference():
    """Returns the reference's hparams dict (import side-effect ready)."""
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    for name in _STUBS:
        try:
            __import__(name)
        except Exception:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    # scipy >= 1.13 moved kaiser; the reference's pqmf imports the old path
    import scipy.signal
    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    # scipy >= 1.15 removed scipy.ndimage.morphology (emotion audio.py)
    import scipy.ndimage
    if "scipy.ndimage.morphology" not in sys.modules:
        morph = types.ModuleType("scipy.ndimage.morphology")
        morph.binary_dilation = scipy.ndimage.binary_dilation
        sys.modules["scipy.ndimage.morphology"] = morph
    # `from matplotlib import cm` (emotion inference.py) needs the attr
    mpl = sys.modules.get("matplotlib")
    if mpl is not None and not hasattr(mpl, "cm"):
        cm = types.ModuleType("matplotlib.cm")
        cm.get_cmap = lambda *a, **k: None
        mpl.cm = cm
        sys.modules["matplotlib.cm"] = cm
    # utils/cwt.py does `from pycwt import wavelet`
    if "pycwt" in sys.modules and not hasattr(sys.modules["pycwt"],
                                              "wavelet"):
        sys.modules["pycwt"].wavelet = types.ModuleType("pycwt.wavelet")
        sys.modules["pycwt.wavelet"] = sys.modules["pycwt"].wavelet
    from utils.hparams import hparams
    return hparams


TINY_HPARAMS = dict(
    hidden_size=32, enc_layers=1, dec_layers=1, num_heads=2,
    enc_ffn_kernel_size=3, dec_ffn_kernel_size=3, dropout=0.0,
    ffn_act="gelu", ffn_padding="SAME", use_pos_embed=True, rel_pos=False,
    encoder_type="fft", decoder_type="fft", audio_num_mel_bins=16,
    use_spk_embed=True, use_spk_id=False, use_split_spk_id=False,
    predictor_hidden=-1, dur_predictor_layers=2, dur_predictor_kernel=3,
    predictor_dropout=0.0, predictor_kernel=5, predictor_layers=2,
    predictor_grad=1.0, use_pitch_embed=True, pitch_type="frame",
    use_uv=True, use_energy_embed=False, dur_loss="mse", pitch_ar=False,
    emo=True, emo_size=16, style=True, nRQ=8, rq_depth=2, vae_dropout=0.0,
    umln=True, f0_gen="gmdiff", f0_timesteps=4, f0_K_step=4,
    f0_max_beta=0.06, f0_residual_layers=2, f0_residual_channels=16,
    f0_dilation_cycle_length=4, decoder="diffsinger", use_txt_cond=True,
    timesteps=4, K_step=4, max_beta=0.06, schedule_type="linear",
    diff_loss_type="l1", diff_decoder_type="wavenet", residual_layers=2,
    residual_channels=16, dilation_cycle_length=4, keep_bins=16,
    spec_min=[-6.0] * 16, spec_max=[0.0] * 16, pitch_norm="log",
    f0_mean=400.0, f0_std=100.0, lambda_f0=1.0, lambda_uv=1.0,
    rq_start=0, forcing=0, diff_start=100000, gaussian_start=True,
    f0_infer_with_ref=False, mel_vmin=-6, mel_vmax=1.5,
)


def tiny_cfg_like_hparams():
    """stylesinger_tpu Config mirroring TINY_HPARAMS."""
    from stylesinger_tpu.config import load_config
    cfg = load_config()
    cfg.update({k: v for k, v in TINY_HPARAMS.items() if k in cfg or True})
    cfg.update(style_wn_layers=4, style_conv_dilations=(1,) * 5,
               aligner_layers=2, aligner_ffn_dim=2048, guided_sigma=0.3,
               note_vocab=100, note_type_vocab=5)
    return cfg
