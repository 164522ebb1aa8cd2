"""Pallas fused VQ argmin kernel vs the XLA path (interpret mode on CPU;
the same kernel compiles for TPU via Mosaic)."""

import numpy as np

import jax
import jax.numpy as jnp

from hqtransformer_tpu.ops.pallas_vq import vq_argmin_pallas
from hqtransformer_tpu.ops.quantize import vq_lookup


def test_pallas_vq_matches_xla():
    rng = np.random.RandomState(0)
    for n, k, d in [(100, 512, 64), (1000, 1000, 32), (4096, 8192, 16)]:
        z = rng.randn(n, d).astype(np.float32)
        e = rng.randn(k, d).astype(np.float32)
        ref = np.asarray(vq_lookup(jnp.asarray(z), jnp.asarray(e)))
        mine = np.asarray(vq_argmin_pallas(jnp.asarray(z), jnp.asarray(e),
                                           interpret=True))
        np.testing.assert_array_equal(ref, mine, err_msg=f'{n}x{k}x{d}')


def test_vq_argmin_large_dim_tiles():
    """Level-3 stage-1 configs reach D=4096 where the default tiles exceed
    scoped VMEM — the adaptive tiling must still bit-match XLA argmin."""
    import jax
    import jax.numpy as jnp
    from hqtransformer_tpu.ops.pallas_vq import vq_argmin_pallas
    from hqtransformer_tpu.ops.quantize import codebook_distances
    z = jax.random.normal(jax.random.PRNGKey(0), (64, 4096))
    e = jax.random.normal(jax.random.PRNGKey(1), (1024, 4096))
    got = vq_argmin_pallas(z, e, interpret=True)
    want = jnp.argmin(codebook_distances(z, e), axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
