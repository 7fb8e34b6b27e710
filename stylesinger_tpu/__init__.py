"""StyleSinger-TPU: a TPU-native (JAX/XLA/Pallas/pjit) singing-voice-synthesis framework.

A from-scratch re-design of the capabilities of StyleSinger (AAAI 2024,
reference: AaronZ345/StyleSinger) for TPU hardware:

- all compute-path code is JAX (flax.linen modules, ``lax.scan`` diffusion
  samplers, Pallas kernels for the hot ops),
- parallelism is expressed with ``jax.sharding.Mesh`` + ``jit`` sharding
  constraints (data-parallel by default, extensible axes for tensor/pipeline),
- static shapes everywhere: sequences are padded to bucketed maxima and all
  modules thread explicit masks,
- randomness is explicit (PRNG keys), state is explicit (flax variable
  collections for RQ-EMA codebooks), configuration is an explicit object
  threaded through constructors (no process-global hparams dict).

Package layout:
  config       typed configuration + YAML-cascade loader
  text         phone-set token encoder
  dsp          signal processing: STFT/mel, F0 tools, CWT, alignment
  models       flax.linen model zoo (FS2 backbone, StyleSinger, diffusion,
               style adaptor, HiFi-GAN NSF vocoder)
  data         binarized dataset IO, bucketing batcher, collation
  training     train step, losses, schedules, checkpointing
  parallel     device-mesh and sharding helpers
  inference    end-to-end synthesis API
"""

__version__ = "0.1.0"
