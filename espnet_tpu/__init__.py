"""espnet_tpu: a TPU-native (JAX/XLA/Pallas/pjit) end-to-end speech toolkit.

A from-scratch re-design of ESPnet's capabilities (ASR, TTS, enhancement,
transducer, LM, speaker, ...) built TPU-first:

- functional flax models with static shapes and mask-based length handling
- on-device, ``lax.while_loop``-based batched beam search
- Pallas kernels for the hot lattice ops (RNN-T loss, monotonic align, WKV)
- ``jax.sharding.Mesh`` + ``pjit`` data/model parallelism over ICI

Reference capability map: espnet/espnet (see SURVEY.md).
"""

__version__ = "0.1.0"
