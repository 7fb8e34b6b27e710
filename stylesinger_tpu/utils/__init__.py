"""Small runtime utilities: timers, meters, multiprocess map, plotting."""

from stylesinger_tpu.utils.meters import AvgMeter, Timer  # noqa: F401
from stylesinger_tpu.utils.multiprocess import (  # noqa: F401
    multiprocess_run,
)
