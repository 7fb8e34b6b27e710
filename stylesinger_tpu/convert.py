"""torch-checkpoint -> flax-parameter converters.

Migration path for users of the reference (AaronZ345/StyleSinger): load a
PyTorch ``model_ckpt_steps_N.ckpt`` ``state_dict`` and emit the parameter
pytree of the flax models in this framework, module by module
(SURVEY.md §7 "checkpoint conversion" hard part).

Layout rules (torch -> flax):
- Linear  [out, in]        -> Dense kernel [in, out]
- Conv1d  [out, in, k]     -> Conv kernel [k, in, out]
- ConvT1d [in, out, k]     -> ConvTranspose(transpose_kernel=True)
                              kernel [k, out, in]
- Embedding / LayerNorm    -> unchanged / (scale, bias)
- weight-norm (weight_g/weight_v) is folded: w = g * v / ||v||_(in,k)
- fused qkv: reference in_proj_weight [3c, c] -> qkv Dense kernel [c, 3c]

Every converter is covered by a numerical parity test against the actual
reference torch modules (tests/test_convert.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def lin(sd: Mapping, name: str, bias: bool = True) -> Dict:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if bias and f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def conv1d(sd: Mapping, name: str) -> Dict:
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def conv1d_wn(sd: Mapping, name: str) -> Dict:
    """Weight-normed Conv1d: fold g * v / ||v|| over (in, k) per out ch."""
    if f"{name}.weight" in sd:  # already remove_weight_norm'ed
        return conv1d(sd, name)
    g = _np(sd[f"{name}.weight_g"])
    v = _np(sd[f"{name}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def convT1d_wn(sd: Mapping, name: str) -> Dict:
    """Weight-normed ConvTranspose1d [in, out, k] -> [k, out, in].

    torch weight_norm(dim=0) keeps the FIRST dim (= in channels for a
    transposed conv): g is [in, 1, 1], the norm runs over (out, k)."""
    if f"{name}.weight" in sd:
        w = _np(sd[f"{name}.weight"])
    else:
        g = _np(sd[f"{name}.weight_g"])
        v = _np(sd[f"{name}.weight_v"])
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def ln(sd: Mapping, name: str) -> Dict:
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def emb(sd: Mapping, name: str) -> Dict:
    return {"embedding": _np(sd[f"{name}.weight"])}


# ---------------------------------------------------------------------------
# transformer / predictors
# ---------------------------------------------------------------------------

def convert_enc_sa_layer(sd: Mapping, p: str) -> Dict:
    """Reference ``EncSALayer`` (common_layers.py:624) -> models.common
    ``EncSALayer`` params. ``p`` like 'layers.0.op'."""
    qkv = _np(sd[f"{p}.self_attn.in_proj_weight"])  # [3c, c]
    out = {
        "LayerNorm_0": ln(sd, f"{p}.layer_norm1"),
        "MultiheadSelfAttention_0": {
            "qkv": {"kernel": qkv.T},
            "out": {"kernel": _np(sd[f"{p}.self_attn.out_proj.weight"]).T},
        },
        "LayerNorm_1": ln(sd, f"{p}.layer_norm2"),
        "TransformerFFN_0": {
            "Conv_0": conv1d(sd, f"{p}.ffn.ffn_1"),
            "LambdaDense_0": {"Dense_0": lin(sd, f"{p}.ffn.ffn_2")},
        },
    }
    return out


def convert_fft_blocks(sd: Mapping, prefix: str, num_layers: int,
                       use_pos_embed: bool = True,
                       use_last_norm: bool = True) -> Dict:
    """Reference ``FFTBlocks`` (tts_modules.py:250) -> models.common
    ``FFTBlocks``."""
    sd = {k[len(prefix):]: v for k, v in sd.items()
          if k.startswith(prefix)}
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        out[f"layer_{i}"] = convert_enc_sa_layer(sd, f"layers.{i}.op")
    if use_pos_embed and "pos_embed_alpha" in sd:
        out["pos_embed_alpha"] = _np(sd["pos_embed_alpha"])
    if use_last_norm and "layer_norm.weight" in sd:
        out["LayerNorm_0"] = ln(sd, "layer_norm")
    return out


def convert_fastspeech_encoder(sd: Mapping, prefix: str,
                               num_layers: int) -> Dict:
    """Reference ``FastspeechEncoder`` -> models.common counterpart."""
    out = {"embed_tokens": emb(sd, f"{prefix}embed_tokens"),
           "blocks": convert_fft_blocks(sd, prefix, num_layers,
                                        use_pos_embed=False)}
    return out


def convert_duration_predictor(sd: Mapping, prefix: str,
                               n_layers: int = 2) -> Dict:
    """Reference ``DurationPredictor`` (tts_modules.py:58): Sequential
    conv.i = [pad, Conv1d, ReLU, LayerNorm, Dropout]."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = conv1d(sd, f"{prefix}conv.{i}.1")
        out[f"ln_{i}"] = ln(sd, f"{prefix}conv.{i}.3")
    out["out"] = lin(sd, f"{prefix}linear")
    return out


def convert_pitch_predictor(sd: Mapping, prefix: str,
                            n_layers: int = 5) -> Dict:
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = conv1d(sd, f"{prefix}conv.{i}.1")
        out[f"ln_{i}"] = ln(sd, f"{prefix}conv.{i}.3")
    out["out"] = lin(sd, f"{prefix}linear")
    if f"{prefix}pos_embed_alpha" in sd:
        out["pos_embed_alpha"] = _np(sd[f"{prefix}pos_embed_alpha"])
    return out


# ---------------------------------------------------------------------------
# style stack
# ---------------------------------------------------------------------------

def convert_wn(sd: Mapping, prefix: str, n_layers: int = 4,
               has_cond: bool = False) -> Dict:
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"in_{i}"] = conv1d_wn(sd, f"{prefix}in_layers.{i}")
        out[f"res_skip_{i}"] = conv1d_wn(sd, f"{prefix}res_skip_layers.{i}")
    if has_cond:
        out["cond"] = conv1d_wn(sd, f"{prefix}cond_layer")
    return out


def convert_conv_blocks(sd: Mapping, prefix: str, n_dilations: int = 5,
                        n_inner: int = 2) -> Dict:
    """Reference lse ``ConvBlocks``: res_blocks.i.blocks.j = Sequential
    [LayerNorm(dim=1), Conv1d(c->2c), Lambda, GELU, Conv1d(2c->c, 1)]."""
    out: Dict[str, Any] = {}
    for i in range(n_dilations):
        res: Dict[str, Any] = {}
        for j in range(n_inner):
            base = f"{prefix}res_blocks.{i}.blocks.{j}"
            res[f"ln_{j}"] = {
                "scale": _np(sd[f"{base}.0.gamma"]).reshape(-1)
                if f"{base}.0.gamma" in sd else
                _np(sd[f"{base}.0.weight"]).reshape(-1),
                "bias": _np(sd[f"{base}.0.beta"]).reshape(-1)
                if f"{base}.0.beta" in sd else
                _np(sd[f"{base}.0.bias"]).reshape(-1),
            }
            res[f"conv_a_{j}"] = conv1d(sd, f"{base}.1")
            res[f"conv_b_{j}"] = conv1d(sd, f"{base}.4")
        out[f"res_{i}"] = res
    out["last_norm"] = {
        "scale": _np(sd.get(f"{prefix}last_norm.gamma",
                            sd.get(f"{prefix}last_norm.weight"))).reshape(-1),
        "bias": _np(sd.get(f"{prefix}last_norm.beta",
                           sd.get(f"{prefix}last_norm.bias"))).reshape(-1),
    }
    out["post"] = conv1d(sd, f"{prefix}post_net1")
    return out


def convert_rq(sd: Mapping, prefix: str, depth: int = 4):
    """Reference ``RQBottleneck`` -> (params={}, codebook collection).
    Reference codebook weight has an extra padding row (RQ.py:14)."""
    codebook: Dict[str, Any] = {}
    for i in range(depth):
        codebook[f"codebook_{i}"] = {
            "embedding": _np(sd[f"{prefix}codebooks.{i}.weight"])[:-1],
            "cluster_size_ema":
                _np(sd[f"{prefix}codebooks.{i}.cluster_size_ema"]),
            "embed_ema": _np(sd[f"{prefix}codebooks.{i}.embed_ema"]),
        }
    return codebook


def convert_cross_atten_layer(sd: Mapping, p: str) -> Dict:
    """Reference ``CrossAttenLayer`` (lse.py:16): torch nn.MultiheadAttention
    + post-norm FFN."""
    w = _np(sd[f"{p}.multihead_attn.in_proj_weight"])  # [3c, c]
    b = _np(sd[f"{p}.multihead_attn.in_proj_bias"])    # [3c]
    c = w.shape[1]
    mha = {
        "q": {"kernel": w[:c].T, "bias": b[:c]},
        "k": {"kernel": w[c:2 * c].T, "bias": b[c:2 * c]},
        "v": {"kernel": w[2 * c:].T, "bias": b[2 * c:]},
        "out": lin(sd, f"{p}.multihead_attn.out_proj"),
    }
    return {
        "mha": mha,
        "linear1": lin(sd, f"{p}.linear1"),
        "linear2": lin(sd, f"{p}.linear2"),
        "norm1": ln(sd, f"{p}.norm1"),
        "norm2": ln(sd, f"{p}.norm2"),
    }


def convert_prosody_aligner(sd: Mapping, prefix: str,
                            num_layers: int = 2) -> Dict:
    return {f"layer_{i}": convert_cross_atten_layer(sd, f"{prefix}layers.{i}")
            for i in range(num_layers)}


def convert_local_style_adaptor(sd: Mapping, prefix: str, *,
                                rq_depth: int = 4, n_dilations: int = 5):
    params = {
        "wavenet": convert_wn(sd, f"{prefix}wavenet.", n_layers=4),
        "encoder": convert_conv_blocks(sd, f"{prefix}encoder.",
                                       n_dilations=n_dilations),
    }
    codebook = {"rq": convert_rq(sd, f"{prefix}rqvae.", depth=rq_depth)}
    return params, codebook


def convert_umln(sd: Mapping, prefix: str) -> Dict:
    return {"affine": lin(sd, f"{prefix}affine_layer.linear_layer")}


# ---------------------------------------------------------------------------
# diffusion denoisers
# ---------------------------------------------------------------------------

def _convert_diff_residual(sd: Mapping, p: str) -> Dict:
    return {
        "dilated_conv": conv1d(sd, f"{p}.dilated_conv"),
        "diffusion_projection": lin(sd, f"{p}.diffusion_projection"),
        "conditioner_projection": conv1d(sd, f"{p}.conditioner_projection"),
        "output_projection": conv1d(sd, f"{p}.output_projection"),
    }


def convert_ddiffnet(sd: Mapping, prefix: str, n_layers: int = 10) -> Dict:
    out: Dict[str, Any] = {
        "input_projection": conv1d(sd, f"{prefix}input_projection"),
        "uv_embed": emb(sd, f"{prefix}uv_embed"),
        "mlp": {"fc1": lin(sd, f"{prefix}mlp.0"),
                "fc2": lin(sd, f"{prefix}mlp.2")},
        "skip_projection": conv1d(sd, f"{prefix}skip_projection"),
        "output_projection": conv1d(sd, f"{prefix}output_projection"),
    }
    for i in range(n_layers):
        out[f"residual_{i}"] = _convert_diff_residual(
            sd, f"{prefix}residual_layers.{i}")
    return out


def convert_diffnet(sd: Mapping, prefix: str, n_layers: int = 20) -> Dict:
    out: Dict[str, Any] = {
        "input_projection": conv1d(sd, f"{prefix}input_projection"),
        "mlp": {"fc1": lin(sd, f"{prefix}mlp.0"),
                "fc2": lin(sd, f"{prefix}mlp.2")},
        "skip_projection": conv1d(sd, f"{prefix}skip_projection"),
        "output_projection": conv1d(sd, f"{prefix}output_projection"),
    }
    for i in range(n_layers):
        out[f"residual_{i}"] = _convert_diff_residual(
            sd, f"{prefix}residual_layers.{i}")
    return out


# ---------------------------------------------------------------------------
# full models
# ---------------------------------------------------------------------------

def convert_note_encoder(sd: Mapping, prefix: str) -> Dict:
    return {"emb": emb(sd, f"{prefix}emb"),
            "type_emb": emb(sd, f"{prefix}type_emb"),
            "dur_ln": lin(sd, f"{prefix}dur_ln")}


def convert_stylesinger(sd: Mapping, cfg: Any):
    """Full reference ``StyleSinger`` state_dict -> flax ``variables``
    ({'params': ..., 'codebook': ...}) for models.stylesinger.StyleSinger."""
    c = cfg
    params: Dict[str, Any] = {
        "encoder": convert_fastspeech_encoder(sd, "encoder.",
                                              c["enc_layers"]),
        "note_encoder": convert_note_encoder(sd, "note_encoder."),
        "spk_embed_proj": lin(sd, "spk_embed_proj"),
        "dur_predictor": convert_duration_predictor(
            sd, "dur_predictor.", c["dur_predictor_layers"]),
        "pitch_embed": emb(sd, "pitch_embed"),
        "decoder": {"blocks": convert_fft_blocks(
            sd, "decoder.", c["dec_layers"], use_pos_embed=True)},
        "mel_out": lin(sd, "mel_out"),
    }
    codebook: Dict[str, Any] = {}
    if c["emo"]:
        params["emo_embed_proj"] = lin(sd, "emo_embed_proj")
    if c["umln"]:
        params["norm"] = convert_umln(sd, "norm.")
    if c["style"]:
        lsa_p, lsa_cb = convert_local_style_adaptor(
            sd, "style_extractor.", rq_depth=c["rq_depth"])
        params["style_extractor"] = lsa_p
        codebook["style_extractor"] = lsa_cb
        params["l1"] = lin(sd, "l1")
        params["align"] = convert_prosody_aligner(
            sd, "align.", c["aligner_layers"])
    if c["f0_gen"] == "gmdiff":
        params["gm_diffnet"] = convert_ddiffnet(
            sd, "gm_diffnet.", c["f0_residual_layers"])
        params["gm_diffnet_inpainte"] = convert_ddiffnet(
            sd, "gm_diffnet_inpainte.", c["f0_residual_layers"])
    else:
        params["pitch_predictor"] = convert_pitch_predictor(
            sd, "pitch_predictor.")
        params["pitch_inpainter_predictor"] = convert_pitch_predictor(
            sd, "pitch_inpainter_predictor.")
    if c["decoder"] == "diffsinger":
        params["ln_proj"] = lin(sd, "ln_proj")
        params["postdiff"] = convert_diffnet(
            sd, "postdiff.denoise_fn.", c["residual_layers"])
    return {"params": params, "codebook": codebook}


def convert_hifigan(sd: Mapping, cfg: Any) -> Dict:
    """Reference NSF ``HifiGanGenerator`` state_dict -> flax params
    (models.hifigan.HifiGanGenerator)."""
    rates = tuple(cfg["upsample_rates"])
    rk = tuple(cfg["resblock_kernel_sizes"])
    rd = tuple(tuple(d) for d in cfg["resblock_dilation_sizes"])
    params: Dict[str, Any] = {
        "conv_pre": conv1d_wn(sd, "conv_pre"),
        "conv_post": conv1d_wn(sd, "conv_post"),
    }
    if any(k.startswith("m_source.") for k in sd):
        params["m_source"] = {"merge": lin(sd, "m_source.l_linear")}
    for i in range(len(rates)):
        params[f"up_{i}"] = convT1d_wn(sd, f"ups.{i}")
        if f"noise_convs.{i}.weight" in sd:
            params[f"noise_conv_{i}"] = conv1d(sd, f"noise_convs.{i}")
        for j in range(len(rk)):
            rb = f"resblocks.{i * len(rk) + j}"
            block: Dict[str, Any] = {}
            for k in range(len(rd[j])):
                block[f"conv1_{k}"] = conv1d_wn(sd, f"{rb}.convs1.{k}")
                block[f"conv2_{k}"] = conv1d_wn(sd, f"{rb}.convs2.{k}")
            params[f"resblock_{i}_{j}"] = block
    return {"params": params}


def convert_ge2e_lstm(sd: Mapping, prefix: str = "lstm",
                      num_layers: int = 3) -> Dict:
    """torch ``nn.LSTM`` (batch_first) -> flax ``nn.RNN(OptimizedLSTMCell)``
    stack params, one ``lstm_<k>/cell`` per layer.

    torch packs gates row-wise in (i, f, g, o) order:
    ``weight_ih_l<k>`` [4H, I], ``weight_hh_l<k>`` [4H, H], plus two bias
    vectors that torch *adds* — flax keeps a single bias on the hidden-side
    dense, so ``bias = bias_ih + bias_hh``. Flax's cell computes the same
    recurrence (i=σ, f=σ, g=tanh, o=σ; c'=f·c+i·g; h'=o·tanh(c')), so the
    mapping is purely a layout change."""
    out: Dict[str, Any] = {}
    for layer in range(num_layers):
        w_ih = _np(sd[f"{prefix}.weight_ih_l{layer}"])
        w_hh = _np(sd[f"{prefix}.weight_hh_l{layer}"])
        b = (_np(sd[f"{prefix}.bias_ih_l{layer}"]) +
             _np(sd[f"{prefix}.bias_hh_l{layer}"]))
        h = w_hh.shape[1]
        cell: Dict[str, Any] = {}
        for gi, gate in enumerate("ifgo"):
            sl = slice(gi * h, (gi + 1) * h)
            cell[f"i{gate}"] = {"kernel": w_ih[sl].T}
            cell[f"h{gate}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        out[f"lstm_{layer}"] = cell
    return out


def convert_ge2e_encoder(sd: Mapping, num_layers: int = 3) -> Dict:
    """GE2E d-vector encoder state_dict -> ``UtteranceEncoder`` variables.

    Works for both pretrained sources the reference relies on: the emotion
    encoder ``checkpoints/global.pt`` (``data_gen/tts/emotion/model.py:
    11-77``) and a resemblyzer ``VoiceEncoder`` ``pretrained.pt`` —
    identical architecture (3-layer LSTM(40->256) + linear(256->256))."""
    params = convert_ge2e_lstm(sd, "lstm", num_layers)
    params["proj"] = lin(sd, "linear")
    return {"params": params}


def load_ge2e_checkpoint(path: str) -> Dict:
    """Load + convert a GE2E encoder checkpoint (.pt). Accepts both the
    ``{"model_state": sd, "step": N}`` wrapper used by ``global.pt`` and
    resemblyzer's ``pretrained.pt``, and a bare state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_ge2e_encoder(sd)


def conv2d_time_wn(sd: Mapping, name: str) -> np.ndarray:
    """PWG upsample smoothing Conv2d(1, 1, (1, K)) -> time kernel [K, 1, 1]
    (weight-normed or folded)."""
    if f"{name}.weight" in sd:
        w = _np(sd[f"{name}.weight"])
    else:
        g = _np(sd[f"{name}.weight_g"])
        v = _np(sd[f"{name}.weight_v"])
        norm = np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    return w[0, 0, 0][:, None, None]


def convert_pwg(sd: Mapping, layers: int = 30, n_scales: int = 4) -> Dict:
    """Reference ``ParallelWaveGANGenerator`` state_dict (weight-normed or
    ``remove_weight_norm``-folded; models/parallel_wavegan.py:22-171) ->
    flax params for models.legacy_vocoders.ParallelWaveGANGenerator."""
    up: Dict[str, Any] = {"conv_in": conv1d_wn(sd, "upsample_net.conv_in")}
    for i in range(n_scales):
        # up_layers interleaves [Stretch2d, Conv2d] pairs — conv at 2i+1
        up[f"up_conv_{i}"] = conv2d_time_wn(
            sd, f"upsample_net.upsample.up_layers.{2 * i + 1}")
    params: Dict[str, Any] = {
        "upsample_net": up,
        "first": conv1d_wn(sd, "first_conv"),
        "post1": conv1d_wn(sd, "last_conv_layers.1"),
        "post2": conv1d_wn(sd, "last_conv_layers.3"),
    }
    if "pitch_embed.weight" in sd:
        params["pitch_embed"] = emb(sd, "pitch_embed")
        params["c_proj"] = lin(sd, "c_proj")
    for i in range(layers):
        p = f"conv_layers.{i}"
        params[f"block_{i}"] = {
            "conv": conv1d_wn(sd, f"{p}.conv"),
            "aux": conv1d_wn(sd, f"{p}.conv1x1_aux"),
            "res": conv1d_wn(sd, f"{p}.conv1x1_out"),
            "skip": conv1d_wn(sd, f"{p}.conv1x1_skip"),
        }
    return {"params": params}


def convert_melgan(sd: Mapping, n_scales: int = 4,
                   stacks: int = 3) -> Dict:
    """Reference ``MelGANGenerator`` state_dict (models/melgan.py:18-160,
    non-causal ``torch.nn.Sequential`` layout) -> flax params for
    models.legacy_vocoders.MelGANGenerator.

    Sequential indices: [pad, conv_pre] then per scale [leaky, convT,
    stack x3] then [leaky, pad, conv_post, tanh]."""
    params: Dict[str, Any] = {"conv_pre": conv1d_wn(sd, "melgan.1")}
    idx = 2
    for i in range(n_scales):
        params[f"up_{i}"] = convT1d_wn(sd, f"melgan.{idx + 1}")
        for j in range(stacks):
            p = f"melgan.{idx + 2 + j}"
            params[f"res_{i}_{j}"] = {
                # stack Sequential: [leaky, pad, conv k, leaky, conv 1x1]
                "conv1": conv1d_wn(sd, f"{p}.stack.2"),
                "conv2": conv1d_wn(sd, f"{p}.stack.4"),
                "skip": conv1d_wn(sd, f"{p}.skip_layer"),
            }
        idx += 2 + stacks
    params["conv_post"] = conv1d_wn(sd, f"melgan.{idx + 2}")
    return {"params": params}


def load_pwg_checkpoint(ckpt_path: str, stats_path: Optional[str] = None,
                        config_path: Optional[str] = None):
    """The reference's ``load_pwg_model`` (vocoders/pwg.py:16-52) for the
    flax generator: loads either an OFFICIAL ParallelWaveGAN checkpoint
    (``{"model": {"generator": sd}}`` + hdf5/npy feature stats used to
    mean/std-normalize input mels) or a CUSTOM task checkpoint
    (``{"state_dict": {"model_gen.*": ...}}``, no stats).

    Returns (variables, stats, gen_params) where stats is None or a
    ``{"mean": [M], "scale": [M]}`` dict and gen_params the generator
    hyperparameters read from config.yaml (empty dict when absent)."""
    import torch

    gen_params: Dict[str, Any] = {}
    if config_path and os.path.exists(config_path):
        import yaml
        with open(config_path) as f:
            gen_params = (yaml.safe_load(f) or {}).get(
                "generator_params", {})
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd, official = _generator_sd(ckpt, ckpt_path)
    stats = (_load_feature_stats(stats_path)
             if official and stats_path and os.path.exists(stats_path)
             else None)
    # Structural hyperparameters are read from the WEIGHTS THEMSELVES
    # (vocoders/pwg.py:24-30 rebuild-from-ckpt semantics): custom task
    # checkpoints often ship no config.yml, and a stale/wrong yaml must
    # not mis-shape the generator. config.yml still supplies what shapes
    # cannot encode (stacks — the dilation schedule leaves no trace in
    # the kernel shapes).
    gen_params["layers"] = len(
        {k.split(".")[1] for k in sd if k.startswith("conv_layers.")})
    up_idx = sorted({int(k.split(".")[3]) for k in sd
                     if k.startswith("upsample_net.upsample.up_layers.")})
    if up_idx:
        up = dict(gen_params.get("upsample_params", {}))
        # upsample Conv2d kernel is (freq_k, 2*scale+1) (layers/upsample.py)
        up["upsample_scales"] = [
            (int(_wn_weight(
                sd, f"upsample_net.upsample.up_layers.{i}").shape[-1]) - 1)
            // 2 for i in up_idx]
        gen_params["upsample_params"] = up
    gen_params["residual_channels"] = int(_wn_weight(
        sd, "first_conv").shape[0])
    gen_params["gate_channels"] = int(_wn_weight(
        sd, "conv_layers.0.conv").shape[0])
    gen_params["skip_channels"] = int(_wn_weight(
        sd, "conv_layers.0.conv1x1_skip").shape[0])
    # conv_in kernel is 2*aux_context_window+1 (layers/upsample.py:155)
    gen_params.setdefault("upsample_params", {})["aux_context_window"] = (
        int(_wn_weight(sd, "upsample_net.conv_in").shape[-1]) - 1) // 2
    # pitch conditioning likewise: the reference's SVS configs carry
    # use_pitch_embed at the hparams top level (outside generator_params);
    # missing it would silently drop the pitch input (flax ignores extra
    # params) and degrade audio with no error
    gen_params["use_pitch_embed"] = any(
        k.startswith("pitch_embed.") for k in sd)
    return convert_pwg(sd, layers=gen_params["layers"],
                       n_scales=len(up_idx)), stats, gen_params


def _generator_sd(ckpt, ckpt_path: str = "<ckpt>"):
    """Extract the generator state_dict from either checkpoint layout the
    reference loads (vocoders/pwg.py:16-52): a CUSTOM task checkpoint
    ``{"state_dict": {"model_gen.*": ...}}`` or an OFFICIAL
    parallel-wavegan training checkpoint ``{"model": {"generator": sd}}``.
    Returns (sd, is_official); raises with a clear message otherwise."""
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = {k[len("model_gen."):]: v
              for k, v in ckpt["state_dict"].items()
              if k.startswith("model_gen.")}
        official = False
    elif isinstance(ckpt, dict) and isinstance(ckpt.get("model"), dict) \
            and "generator" in ckpt["model"]:
        sd = ckpt["model"]["generator"]
        official = True
    else:
        raise ValueError(
            f"{ckpt_path}: not a recognized vocoder checkpoint (expected "
            "'state_dict' with model_gen.* keys or model.generator)")
    if not sd:
        raise ValueError(f"{ckpt_path}: generator state_dict is empty")
    return sd, official


def _wn_weight(sd: Mapping, name: str) -> np.ndarray:
    """Raw (possibly weight-normed) torch conv weight, for shape probes."""
    key = f"{name}.weight" if f"{name}.weight" in sd else f"{name}.weight_v"
    return _np(sd[key])


def load_melgan_checkpoint(ckpt_path: str,
                           stats_path: Optional[str] = None):
    """MelGAN analogue of load_pwg_checkpoint: official
    ``{"model": {"generator": sd}}`` or custom ``model_gen.*`` layout,
    optional hdf5/npy feature stats.

    Returns (variables, stats, gen_params) where gen_params carries the
    architecture READ FROM THE CHECKPOINT ITSELF (upsample scales from each
    ConvTranspose kernel k=2r, channel width from conv_pre) so the wrapper
    builds a generator matching the trained weights, not the repo config —
    mirrors vocoders/pwg.py:24-30 which rebuilds the torch generator from
    the ckpt's own config.yml."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd, official = _generator_sd(ckpt, ckpt_path)
    stats = (_load_feature_stats(stats_path)
             if official and stats_path and os.path.exists(stats_path)
             else None)
    # infer scale count from the Sequential layout: conv_pre at 1, then
    # 5 entries per scale (leaky, convT, 3 stacks), conv_post at 5n+4
    tops = [int(k.split(".")[1]) for k in sd if k.startswith("melgan.")]
    if not tops:
        raise ValueError(
            f"{ckpt_path}: no 'melgan.*' keys — not a MelGAN generator "
            "checkpoint (PWG/HiFi-GAN ckpts need their own loaders)")
    n_scales = (max(tops) - 4) // 5
    gen_params = {
        "base_channels": int(_wn_weight(sd, "melgan.1").shape[0]),
        # ConvTranspose1d weight is [in, out, k] with k = 2*rate
        "upsample_scales": [
            int(_wn_weight(sd, f"melgan.{3 + 5 * i}").shape[2]) // 2
            for i in range(n_scales)],
    }
    return convert_melgan(sd, n_scales=n_scales), stats, gen_params


def _load_feature_stats(stats_path: str) -> Dict[str, np.ndarray]:
    """Official ParallelWaveGAN mel feature stats: hdf5 ("mean"/"scale"
    datasets) or npy ([mean, scale]) — vocoders/pwg.py:31-38."""
    if stats_path.endswith(".npy"):
        arr = np.load(stats_path)
        return {"mean": np.asarray(arr[0], np.float32),
                "scale": np.asarray(arr[1], np.float32)}
    import h5py
    with h5py.File(stats_path, "r") as f:
        return {"mean": np.asarray(f["mean"], np.float32),
                "scale": np.asarray(f["scale"], np.float32)}


def load_torch_checkpoint(path: str, child: Optional[str] = "model"):
    """Read a reference ``model_ckpt_steps_N.ckpt``: returns the flat
    state_dict of the requested child (utils/trainer.py:421-434 layout)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if child is not None and child in sd:
        sd = sd[child]
    return {k: v for k, v in sd.items()}


def main() -> None:
    """CLI: convert a reference torch checkpoint to framework params.

    usage: python -m stylesinger_tpu.convert <model.ckpt> <out_dir>
           [--config egs/stylesinger.yaml] [--hifigan]
    """
    import argparse
    import os
    import pickle

    from stylesinger_tpu.config import load_config

    ap = argparse.ArgumentParser("stylesinger_tpu.convert")
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--config", default=None)
    ap.add_argument("--hifigan", action="store_true",
                    help="the checkpoint is a vocoder (model_gen child)")
    a = ap.parse_args()
    cfg = load_config(a.config)
    sd = load_torch_checkpoint(a.ckpt, child="model_gen" if a.hifigan
                               else "model")
    variables = convert_hifigan(sd, cfg) if a.hifigan else \
        convert_stylesinger(sd, cfg)
    os.makedirs(a.out_dir, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        ocp.StandardCheckpointer().save(
            os.path.join(os.path.abspath(a.out_dir), "converted"),
            variables)
        print(f"| wrote orbax params to {a.out_dir}/converted")
    except Exception:
        with open(os.path.join(a.out_dir, "converted.pkl"), "wb") as f:
            pickle.dump(variables, f)
        print(f"| wrote pickle params to {a.out_dir}/converted.pkl")


if __name__ == "__main__":
    main()
