"""vibravox-tpu: a TPU-native (JAX/XLA/Pallas) speech framework.

Re-implements the capabilities of the jhauret/vibravox reference framework
(bandwidth extension with the EBEN PQMF-multiband GAN and regressive Mimi codec,
speech-to-phoneme wav2vec2-CTC fine-tuning, and ECAPA2 speaker verification)
as an idiomatic JAX framework: jit-compiled train/eval steps over a
``jax.sharding.Mesh``, channels-last tensors, Pallas kernels on the hot DSP
paths, orbax checkpointing and a Hydra-compatible config/CLI surface.
"""

__version__ = "0.1.0"
