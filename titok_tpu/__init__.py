"""titok_tpu: a TPU-native (JAX/XLA/Pallas) video tokenization framework.

Re-implementation of the capabilities of the TiTok-Video reference
(NilanEkanayake/TiTok-Video) designed TPU-first:

- The core data structure is the **PackedBatch**: a fixed-size
  ``[seq_budget, ...]`` buffer holding multiple variable-shape video clips
  flattened into one sequence with per-position segment ids (the XLA-native
  analog of the reference's list-of-clips + flash-attn varlen
  ``cu_seqlens`` interface, cf. reference ``model/base/transformer.py:100``).
- All shapes are static so one jitted SPMD program runs every train step.
- Attention is a Pallas flash-attention kernel with segment-id masking.
- Scale-out is a ``jax.sharding.Mesh`` with a ``data`` axis (packed buffers
  sharded per-chip), gradients psum'd by the SPMD partitioner over ICI.
"""

__version__ = "0.1.0"

from titok_tpu.config import Config, load_config  # noqa: F401
