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


def _honor_jax_platforms_env() -> None:
    """Re-apply the JAX_PLATFORMS environment variable.

    Some container setups import jax from sitecustomize with a device
    plugin that overrides JAX_PLATFORMS, so `JAX_PLATFORMS=cpu python
    script.py` would still initialize the accelerator backend. Re-applying
    the documented env var via jax.config before the first jax operation
    restores standard JAX semantics for every CLI/test entry point that
    imports this package. No-op when the variable is unset or the backend
    is already initialized."""
    import os
    want = os.environ.get('JAX_PLATFORMS')
    if not want:
        return
    try:
        import jax
        jax.config.update('jax_platforms', want)
    except Exception:  # backend already initialized: leave it be
        pass


_honor_jax_platforms_env()
