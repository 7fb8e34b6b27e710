"""Typed configuration with YAML-cascade loading.

Replaces the reference's process-global ``hparams`` dict
(``utils/hparams.py:17-124`` in AaronZ345/StyleSinger) with an explicit,
immutable-by-convention ``Config`` object that is *threaded through
constructors*.  The YAML semantics are kept compatible:

- ``base_config:`` entries are depth-first merged (children override parents,
  cycle-guarded),
- dotted-key string overrides (``"a=1,b.c=2"``) with type coercion,
- config persistence to the experiment work dir.

Unlike the reference there is no import-time global state: every model and
pipeline component receives the ``Config`` it needs.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import yaml


class Config(dict):
    """A dict with attribute access. Values are plain Python scalars/lists."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def copy(self) -> "Config":
        return Config(dict.copy(self))

    def replace(self, **kwargs: Any) -> "Config":
        out = self.copy()
        out.update(kwargs)
        return out


# ---------------------------------------------------------------------------
# Defaults: the full training/model hyperparameter surface of the StyleSinger
# recipe (reference: egs/stylesinger.yaml + egs/egs_bases/{config_base,
# tts/base,tts/fs2}.yaml), expressed as one flat namespace.
# ---------------------------------------------------------------------------

# fmt: off
SPEC_MIN_48K = [-6.0] * 80
SPEC_MAX_48K = [
    0.03640973940491676, 0.039425432682037354, 0.29524752497673035, 0.45784831047058105,
    0.48333120346069336, 0.5335848927497864, 0.6071611046791077, 0.5474293828010559,
    0.6076506972312927, 0.5390501022338867, 0.5743886232376099, 0.485751211643219,
    0.4248744249343872, 0.4843744933605194, 0.43331536650657654, 0.5356124639511108,
    0.4875929355621338, 0.48614853620529175, 0.44228559732437134, 0.5027499198913574,
    0.6554337739944458, 0.3469322919845581, 0.33981558680534363, 0.37933868169784546,
    0.34751009941101074, 0.22094282507896423, 0.252963662147522, 0.18274202942848206,
    0.1976650059223175, 0.1770155429840088, 0.18206502497196198, 0.1002601608633995,
    0.18640224635601044, 0.27240633964538574, 0.04153885692358017, -0.010289354249835014,
    -0.012929759919643402, 0.035185474902391434, 0.18124309182167053, -0.14512233436107635,
    -0.1778590828180313, -0.20491982996463776, -0.30119436979293823, -0.1735714226961136,
    -0.1039585992693901, -0.177497997879982, -0.28803232312202454, -0.24049188196659088,
    -0.4682924747467041, -0.5791841745376587, -0.5170156955718994, -0.6380605697631836,
    -0.7147259712219238, -0.6607836484909058, -0.7288452982902527, -0.6338580250740051,
    -0.7092624306678772, -0.8101216554641724, -0.7633087038993835, -0.8251329660415649,
    -0.6936700940132141, -0.5180960297584534, -0.7972619533538818, -0.807314932346344,
    -0.7151175737380981, -0.7785399556159973, -0.8709449768066406, -0.8360402584075928,
    -0.8253681659698486, -0.9778416156768799, -1.12929368019104, -1.3274869918823242,
    -1.3071579933166504, -1.5234452486038208, -1.6191706657409668, -1.708594799041748,
    -1.8246771097183228, -1.9193823337554932, -2.1361801624298096, -2.3829283714294434,
]
# fmt: on

DEFAULTS: Dict[str, Any] = dict(
    # --- audio format (reference egs/stylesinger.yaml:29-36) ---
    audio_sample_rate=48000,
    hop_size=256,
    win_size=1024,
    fft_size=1024,
    fmin=20,
    fmax=24000,
    audio_num_mel_bins=80,
    min_level_db=-100,
    ref_level_db=20,
    loud_norm=False,
    # --- sequence bounds ---
    max_frames=3000,
    min_frames=0,
    max_input_tokens=2000,
    frames_multiple=1,
    # shape buckets used to keep XLA compilations finite (TPU-specific; the
    # reference pads dynamically per batch which forces recompiles on TPU)
    frame_buckets=(256, 512, 1024, 1536, 2048, 3000),
    token_buckets=(64, 128, 256, 512, 1000, 2000),
    # --- model switches (reference egs/stylesinger.yaml:20-26) ---
    emo=True,
    style=True,
    umln=True,
    f0_gen="gmdiff",       # gmdiff | conv
    decoder="diffsinger",  # diffsinger | fft | prodiff
    use_nsf=True,
    # --- transformer dims (egs/egs_bases/tts/base.yaml:64-76) ---
    hidden_size=256,
    enc_layers=4,
    dec_layers=4,
    num_heads=2,
    enc_ffn_kernel_size=9,
    dec_ffn_kernel_size=9,
    ffn_act="gelu",
    ffn_padding="SAME",
    dropout=0.1,
    use_pos_embed=True,
    encoder_type="fft",
    decoder_type="fft",
    # --- predictors (egs/egs_bases/tts/fs2.yaml) ---
    predictor_hidden=-1,
    predictor_kernel=5,
    predictor_layers=5,
    predictor_dropout=0.5,
    dur_predictor_kernel=3,
    dur_predictor_layers=2,
    dur_loss="mse",
    predictor_grad=1.0,
    # --- pitch ---
    pitch_type="frame",
    pitch_norm="log",
    cwt_std_scale=0.8,
    use_pitch_embed=True,
    use_uv=True,
    use_energy_embed=False,
    pitch_loss="l1",
    f0_mean=400.0,
    f0_std=100.0,
    # --- speaker / emotion ---
    use_spk_embed=True,
    use_spk_id=False,
    num_spk=150,
    emo_size=256,
    spk_embed_size=256,
    # pretrained d-vector encoder checkpoints (torch .pt, converted at
    # load): reference hparam `emotion_encoder_path` (checkpoints/
    # global.pt) + resemblyzer's bundled pretrained.pt; empty -> random
    emotion_encoder_path="",
    speaker_encoder_path="",
    # reference quirk: the speaker d-vector is computed from the NATIVE-
    # rate wav through the 16 kHz front-end (style_binarizer.py:325,
    # inference/StyleSinger.py:100-104); False = proper 16 kHz resample
    spk_embed_at_native_rate=True,
    # --- note encoder ---
    note_vocab=100,
    note_type_vocab=5,
    # --- style / RQ (egs/stylesinger.yaml:102-110) ---
    nRQ=128,
    rq_depth=4,
    rq_start=20500,
    forcing=20000,
    lambda_commit=0.25,
    vae_dropout=0.0,
    rq_decay=0.99,
    rq_eps=1e-5,
    guided_sigma=0.3,
    aligner_layers=2,
    aligner_ffn_dim=2048,
    style_wn_layers=4,
    style_conv_dilations=(1, 1, 1, 1, 1),
    # --- f0 gmdiff (egs/stylesinger.yaml:112-135) ---
    f0_timesteps=100,
    f0_K_step=100,
    f0_max_beta=0.06,
    f0_residual_layers=10,
    f0_residual_channels=192,
    f0_dilation_cycle_length=4,
    gaussian_start=True,
    f0_infer_with_ref=False,
    # --- mel diffusion (egs/stylesinger.yaml:137-147) ---
    diff_start=100000,
    timesteps=100,
    K_step=100,
    max_beta=0.06,
    schedule_type="linear",
    diff_loss_type="l1",
    diff_decoder_type="wavenet",
    pndm_speedup=1,
    # DPM-Solver++(2M) fast mel sampling: number of denoiser calls
    # (0 = off). Takes precedence over pndm_speedup; 8-12 NFE match
    # PLMS-20 quality (see tools/eval_fast_samplers.py gates).
    dpm_steps=0,
    residual_layers=20,
    residual_channels=256,
    dilation_cycle_length=4,
    keep_bins=80,
    spec_min=SPEC_MIN_48K,
    spec_max=SPEC_MAX_48K,
    use_txt_cond=True,
    # --- losses ---
    mel_loss="l1:0.5|ssim:0.5",
    lambda_f0=1.0,
    lambda_uv=1.0,
    lambda_ph_dur=0.1,
    lambda_word_dur=0.0,
    lambda_sent_dur=1.0,
    lambda_energy=0.1,
    # --- optimization (egs/egs_bases/tts/base.yaml:82-95) ---
    lr=2.0,
    scheduler="rsqrt",
    warmup_updates=8000,
    optimizer_adam_beta1=0.9,
    optimizer_adam_beta2=0.98,
    weight_decay=0.0,
    clip_grad_norm=1.0,
    accumulate_grad_batches=1,
    # --- train loop ---
    seed=1234,
    max_updates=320000,
    max_tokens=10000,
    max_sentences=100000,
    val_check_interval=5000,
    valid_infer_interval=5000,
    tb_log_interval=100,
    num_ckpt_keep=3,
    save_best=True,
    # permanent eval-only snapshots (params+codebook, no opt state) every
    # N steps under <work_dir>/ckpt_milestones — the cross-run quality
    # sweep (e.g. validation FFE vs training step) restores these; 0 = off.
    # Unlike keep-K these are never pruned.
    milestone_interval=0,
    # warm-start weights before training (reference load_ckpt hparam,
    # strict=False): a torch .ckpt (converted) or a work dir with ckpt/
    load_ckpt="",
    # host-RSS watchdog: 0 = auto (arms at 85% of MemTotal ONLY on
    # remote-PJRT/tunnel backends, where the client leaks per step; stays
    # off on local cpu/gpu/tpu), -1 = off, else an explicit GB
    # ceiling. On breach the trainer checkpoints and exits 75 (EX_TEMPFAIL)
    # so a supervisor (run.py train --supervise) can restart-and-resume —
    # needed because some remote-PJRT clients leak host memory per step
    # (docs/OPS.md) and the kernel OOM killer corrupts in-flight saves.
    max_host_rss_gb=0.0,
    # multi-step dispatch: run this many optimizer steps per device
    # program (lax.scan over a device-resident stacked epoch) instead of
    # one host dispatch per step. 1 = off (streaming per-step path).
    # Cuts per-step batch upload + dispatch latency + the tunnel client's
    # per-call host-RSS leak by the window length; requires the epoch to
    # fit device_data_budget_mb on-device (else falls back to streaming).
    steps_per_dispatch=1,
    device_data_budget_mb=1024,
    num_sanity_val_steps=-1,
    num_valid_plots=10,
    max_valid_tokens=60000,
    max_valid_sentences=1,
    endless_ds=True,
    sort_by_len=True,
    ds_workers=1,
    # --- vocoder ---
    vocoder="HifiGAN_NSF",
    vocoder_ckpt="",
    vocoder_denoise_c=0.0,
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=512,
    resblock="1",
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    harmonic_num=8,
    # overlap-save block length for the generator's MRF groups (0 = off);
    # XLA conv tiling collapses on one huge spatial dim with few channels,
    # blocked application is ~3x faster and numerically identical
    mrf_block=2048,
    # fuse each blocked MRF group into one Pallas kernel (ops/
    # mrf_pallas.py: polyphase + output-packed matmuls, whole group in
    # VMEM) on stages with <=128 channels; param tree identical to the
    # flax path so checkpoints serve both
    mrf_pallas=False,
    # conv compute dtype for the vocoder generator (params stay fp32)
    vocoder_compute_dtype="float32",
    # strided F0 sampler: 1 = reference-parity 100-step ancestral; >1 takes
    # DDIM jumps (gaussian) + span posteriors (uv) with T/speedup calls
    f0_speedup=1,
    # --- data / work dirs ---
    binary_data_dir="data/binary/style",
    processed_data_dir="data/processed/style",
    # raw-corpus preprocessing (reference data_gen/tts/bin/preprocess.py +
    # egs/datasets/audio/*/pre_align.py): a registered meta adapter reads
    # raw_data_dir into rows, then Preprocessor normalizes/g2ps them
    raw_data_dir="",
    pre_align_cls="",           # meta-adapter name ("lj"/"emotion"/...)
    language="zh",              # txt-processor selection for g2p
    work_dir="",
    train_set_name="train",
    valid_set_name="valid",
    test_set_name="test",
    num_test_samples=72,
    test_input_dir="",
    valid_prefixes=[],
    test_prefixes=[],
    binarization_args=dict(
        with_align=True, with_f0=True, with_spk_embed=True, with_emotion=True,
        with_wav=True, shuffle=False, trim_eos_bos=False, trim_sil=False,
    ),
    pitch_extractor="autocorr",
    # offline binarization backend: "cpu" (default) pins the phase to the
    # host CPU JAX backend — per-item F0 tracking / GE2E embeds are tiny
    # dispatches that are pathological through a remote-PJRT TPU tunnel
    # (measured: ~1 item/s on host vs 0 items in 15 min tunneled);
    # any other value keeps the process's default platform
    binarize_platform="cpu",
    # --- parallelism (TPU-native; no analogue in the reference) ---
    mesh_shape=dict(data=-1),   # -1: all devices on the data axis
    param_dtype="float32",
    # activation compute dtype for the TRAIN step (params/optimizer stay
    # f32; LN stats / attention softmax / loss math stay f32). MEASURED on
    # v5e at the flagship size (bench_train.py, 8x1024 frames): f32 30.0
    # steps/s vs bf16 26.0-26.8 — f32 matmuls already lower to bf16 MXU
    # passes, so the extra converts cost more than the activation
    # bandwidth they save at hidden=256. f32 is therefore the default AND
    # the recipe setting; bfloat16 remains available for larger variants.
    compute_dtype="float32",
    # --- infer ---
    save_gt=True,
    save_f0=True,
    gen_dir_name="",
    profile_infer=False,
)


def _deep_merge(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def _load_yaml_cascade(path: str, visited: Optional[set] = None) -> Dict[str, Any]:
    """DFS merge of ``base_config`` chains, children override parents.

    Mirrors the merge order of the reference loader
    (``utils/hparams.py:48-68``), with a cycle guard.
    """
    visited = visited if visited is not None else set()
    apath = os.path.abspath(path)
    if apath in visited:
        raise ValueError(f"base_config cycle at {path}")
    visited.add(apath)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    merged: Dict[str, Any] = {}
    bases = raw.pop("base_config", [])
    if isinstance(bases, str):
        bases = [bases]
    for base in bases:
        base_path = base if os.path.isabs(base) else os.path.join(
            os.path.dirname(path), base)
        if not os.path.exists(base_path):
            # also try relative to cwd (reference allows egs/-rooted paths)
            base_path = base
        _deep_merge(merged, _load_yaml_cascade(base_path, visited))
    _deep_merge(merged, raw)
    return merged


def _coerce(value: str) -> Any:
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    if value.lower() in ("none", "null"):
        return None
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            pass
    if value.startswith(("[", "{", "(")):
        try:
            return json.loads(value.replace("(", "[").replace(")", "]"))
        except json.JSONDecodeError:
            pass
    return value


def _split_overrides(overrides: str) -> list:
    """Split ``"a=1,b=[2,3]"`` on commas not inside brackets/parens."""
    return re.split(r",(?![^\[\(]*[\]\)])", overrides)


def apply_overrides(cfg: Config, overrides: str) -> Config:
    """Apply ``"a=1,b.c=2"`` style overrides with type coercion.

    Compatible with the reference ``--hparams`` flag
    (``utils/hparams.py:86-99``).
    """
    if not overrides:
        return cfg
    for part in _split_overrides(overrides):
        if not part.strip():
            continue
        key, value = part.split("=", 1)
        key = key.strip()
        node: Dict[str, Any] = cfg
        subkeys = key.split(".")
        for sk in subkeys[:-1]:
            node = node.setdefault(sk, {})
        node[subkeys[-1]] = _coerce(value.strip())
    return cfg


def load_config(path: Optional[str] = None, overrides: str = "",
                **kwargs: Any) -> Config:
    """Build a Config: defaults <- YAML cascade <- string overrides <- kwargs."""
    cfg = Config(json.loads(json.dumps(DEFAULTS)))  # deep copy of defaults
    if path is not None:
        _deep_merge(cfg, _load_yaml_cascade(path))
    explicit = {p.split("=", 1)[0].strip()
                for p in _split_overrides(overrides)
                if p.strip() and "=" in p}
    explicit |= set(kwargs)
    apply_overrides(cfg, overrides)
    cfg.update(kwargs)
    apply_spec_stats(cfg, explicit)
    return cfg


def apply_spec_stats(cfg: Config, explicit: Optional[set] = None) -> Config:
    """Opt-in per-dataset diffusion bounds: when ``use_data_spec_stats`` is
    true and the binarizer wrote ``<binary_data_dir>/spec_stats.json``
    (per-bin train-mel min/max), swap them in for the hand-made yaml tables
    the reference ships (egs/stylesinger.yaml:142-143).

    Explicit ``spec_min``/``spec_max`` overrides or kwargs win over the
    data stats (``explicit`` = keys the user set on the CLI/call)."""
    if not cfg.get("use_data_spec_stats"):
        return cfg
    if explicit and ("spec_min" in explicit or "spec_max" in explicit):
        print("| spec_min/spec_max set explicitly; skipping "
              "spec_stats.json swap")
        return cfg
    fn = os.path.join(cfg.get("binary_data_dir", ""), "spec_stats.json")
    if os.path.exists(fn):
        stats = json.load(open(fn))
        cfg["spec_min"] = stats["spec_min"]
        cfg["spec_max"] = stats["spec_max"]
    return cfg


def save_config(cfg: Config, work_dir: str) -> str:
    """Persist the resolved config to ``<work_dir>/config.yaml`` (reference
    persists to ``checkpoints/<exp>/config.yaml``, utils/hparams.py:70-84)."""
    os.makedirs(work_dir, exist_ok=True)
    out = os.path.join(work_dir, "config.yaml")
    with open(out, "w") as f:
        yaml.safe_dump(dict(cfg), f, sort_keys=True)
    return out


def tiny_test_config(**kwargs: Any) -> Config:
    """A miniature config for fast unit tests and the multichip dry run."""
    cfg = load_config()
    cfg.update(
        hidden_size=32,
        enc_layers=1,
        dec_layers=1,
        num_heads=2,
        enc_ffn_kernel_size=3,
        dec_ffn_kernel_size=3,
        predictor_layers=2,
        f0_residual_layers=1,
        f0_residual_channels=16,
        residual_layers=1,
        residual_channels=16,
        timesteps=4,
        K_step=4,
        f0_timesteps=4,
        f0_K_step=4,
        nRQ=8,
        rq_depth=2,
        aligner_layers=1,
        aligner_ffn_dim=32,
        style_wn_layers=2,
        style_conv_dilations=(1,),
        audio_num_mel_bins=16,
        keep_bins=16,
        emo_size=16,
        spk_embed_size=16,
        upsample_rates=(4, 4, 2, 2),
        upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=16,
        harmonic_num=2,
        max_frames=64,
        frame_buckets=(32, 64),
        token_buckets=(8, 16),
        warmup_updates=10,
    )
    cfg.update(kwargs)
    return cfg
