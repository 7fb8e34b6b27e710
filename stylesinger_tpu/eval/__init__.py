"""Evaluation metrics: EER, MCD, FFE."""

from stylesinger_tpu.eval.metrics import (  # noqa: F401
    compute_eer, ffe, mcd,
)
