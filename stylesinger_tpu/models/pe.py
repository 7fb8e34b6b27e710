"""PitchExtractor: predict F0 from generated mels.

Parity target: ``PitchExtractor`` (``modules/fastspeech/pe.py:119-148`` in
AaronZ345/StyleSinger) and its task (``tasks/tts/pe.py``): conv-stack mel
encoder + pitch predictor trained on (f0, uv) targets, used to re-estimate
F0 from synthesized mels when the acoustic model doesn't emit it.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from stylesinger_tpu.dsp.pitch import denorm_f0
from stylesinger_tpu.models.common import ConvBlocks, PitchPredictor


class PitchExtractor(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """mel [B, T, M] -> {'pitch_pred': [B, T, 2], 'f0_denorm_pred'}."""
        c = self.cfg
        h = c["hidden_size"]
        nonpadding = (jnp.abs(mel).sum(-1) > 0).astype(jnp.float32)
        x = ConvBlocks(c["audio_num_mel_bins"], h,
                       dilations=(1,) * 5, kernel_size=5,
                       name="mel_encoder")(mel, nonpadding,
                                           deterministic=deterministic)
        pred = PitchPredictor(
            h, odim=2, n_layers=c["predictor_layers"],
            kernel_size=c["predictor_kernel"],
            dropout=c["predictor_dropout"],
            name="pitch_predictor")(x, nonpadding,
                                    deterministic=deterministic)
        f0 = pred[:, :, 0]
        uv = (pred[:, :, 1] > 0).astype(jnp.float32)
        f0_denorm = denorm_f0(
            f0, uv if c["use_uv"] else None, pitch_norm=c["pitch_norm"],
            f0_mean=c["f0_mean"], f0_std=c["f0_std"],
            pitch_padding=nonpadding == 0)
        return {"pitch_pred": pred, "f0_denorm_pred": f0_denorm,
                "nonpadding": nonpadding}


def pe_loss(ret: Dict, f0: jnp.ndarray, uv: jnp.ndarray,
            cfg: Any) -> Dict[str, jnp.ndarray]:
    """uv BCE + voiced-masked F0 L1 (reference tasks/tts/pe.py losses)."""
    from stylesinger_tpu.training.losses import f0_uv_losses

    return f0_uv_losses(ret["pitch_pred"], f0, uv, ret["nonpadding"], cfg)
