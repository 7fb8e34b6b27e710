"""Pallas TPU kernels for the hot DSP/compute ops.

Each op keeps a pure-XLA twin (used on CPU and as the parity golden); the
Pallas path is selected automatically on TPU backends.
"""

from stylesinger_tpu.ops.mel_pallas import mel_spectrogram  # noqa: F401
