"""Signal-processing front-end, fully self-contained (no librosa/parselmouth).

Every op has two faces:
- a **JAX** implementation (jit-able, batched, TPU-resident) used in training,
  inference, and the on-device binarizer path;
- where useful, a **numpy** twin for the offline CPU pipeline and as the
  golden reference in tests.
"""

from stylesinger_tpu.dsp.mel import (  # noqa: F401
    mel_filterbank, stft_magnitude, wav2mel, wav2spec_np, pad_wav_to_frames,
)
from stylesinger_tpu.dsp.pitch import (  # noqa: F401
    f0_to_coarse, norm_f0, denorm_f0, norm_interp_f0_np, autocorr_pitch,
)
from stylesinger_tpu.dsp.align import (  # noqa: F401
    mel2ph_from_durs_np, mel2ph_to_dur, expand_states,
)
from stylesinger_tpu.dsp.cwt import (  # noqa: F401
    cont_lf0_np, cwt_mexican_hat, inverse_cwt, cwt2f0,
)
