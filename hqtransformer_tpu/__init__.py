"""hqtransformer_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
kakaobrain/hqtransformer ("Locally Hierarchical Auto-Regressive Modeling for Image
Generation", NeurIPS 2022).

Built from scratch for TPU: flax modules in NHWC layout, jit/pjit end-to-end,
`lax.scan` decode loops with static KV caches, on-device top-k/top-p sampling,
Pallas kernels for the vector-quantization hot path, and `jax.sharding.Mesh`
data/tensor parallelism over ICI.

This is not a port of the PyTorch reference; see SURVEY.md for the structural map
of the reference that defines the capability surface.
"""

__version__ = "0.1.0"
