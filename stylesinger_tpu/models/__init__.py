"""flax.linen model zoo.

Modules are batch-first ``[B, T, C]`` (the reference's fairseq-era code is
time-major ``[T, B, C]``; on TPU batch-first keeps the lane dimension = C
aligned to the VPU/MXU without transposes), thread explicit masks, and take
PRNG keys for all stochasticity.
"""

from stylesinger_tpu.models.fs2 import FastSpeech2  # noqa: F401
from stylesinger_tpu.models.stylesinger import NoteEncoder, StyleSinger  # noqa: F401
from stylesinger_tpu.models.hifigan import (  # noqa: F401
    HifiGanGenerator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
)
from stylesinger_tpu.models.umln import UMLN  # noqa: F401
from stylesinger_tpu.models.style import (  # noqa: F401
    LocalStyleAdaptor, ProsodyAligner,
)
