"""Unit tests for core ops: VQ EMA update, top-k/top-p cutoffs, resampling —
each against the torch reference's behaviour on identical inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hqtransformer_tpu.ops import quantize as q
from hqtransformer_tpu.ops import resample as rs
from hqtransformer_tpu.ops import topk_topp as tkp
from reference_loader import ref_module


def test_ema_update_matches_reference():
    """Single-process EMA update must match the torch EMAVectorQuantizer
    (patching out its unconditional all_reduce, `quantizer.py:111-112`)."""
    ref_q = ref_module('hqvae.models.stage1.modules.quantizer')
    torch.manual_seed(0)
    # keep every code in use: dead codes give cluster_size ~ 0 whose smoothed
    # division amplifies fp noise into argmin flips, which is not what this
    # test is about
    tm = ref_q.EMAVectorQuantizer(dim=4, n_embed=8, beta=0.25)
    tm.train()

    # neutralize collectives for single-process comparison
    class _NoDist:
        class ReduceOp:
            SUM = None

        @staticmethod
        def all_reduce(*a, **k):
            return None

        @staticmethod
        def is_initialized():
            return False

    ref_q.dist_fn = _NoDist

    # .copy() matters: jnp.asarray is zero-copy on CPU, and the torch forward
    # mutates these buffers in place
    state = q.EMAState(
        embedding=jnp.asarray(tm.embedding.numpy().copy()),
        cluster_size=jnp.asarray(tm.cluster_size.numpy().copy()),
        embedding_avg=jnp.asarray(tm.embedding_avg.numpy().copy()))

    rng = np.random.RandomState(1)
    for step in range(3):
        z = rng.randn(4, 4, 8, 8).astype(np.float32)  # NCHW for torch
        with torch.no_grad():
            _, _, t_codes = tm(torch.from_numpy(z))
        z_flat = np.transpose(z, (0, 2, 3, 1)).reshape(-1, 4)
        j_codes = q.vq_lookup(jnp.asarray(z_flat), state.embedding)
        np.testing.assert_array_equal(t_codes.numpy(), np.asarray(j_codes))
        state = q.ema_update(state, jnp.asarray(z_flat), j_codes)
        np.testing.assert_allclose(tm.embedding.numpy(),
                                   np.asarray(state.embedding),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(tm.cluster_size.numpy(),
                                   np.asarray(state.cluster_size),
                                   atol=1e-5, rtol=1e-5)


def test_ema_psum_equals_global_batch():
    """psum'd per-shard stats == single-device update on the full batch."""
    rng = np.random.RandomState(0)
    z = rng.randn(8 * 16, 8).astype(np.float32)
    key = jax.random.PRNGKey(0)
    state = q.init_ema_state(key, 16, 8)
    codes = q.vq_lookup(jnp.asarray(z), state.embedding)
    ref_state = q.ema_update(state, jnp.asarray(z), codes)

    def shard_update(z_shard):
        c = q.vq_lookup(z_shard, state.embedding)
        return q.ema_update(state, z_shard, c, axis_name='data')

    out = jax.pmap(shard_update, axis_name='data')(
        jnp.asarray(z).reshape(8, 16, 8))
    np.testing.assert_allclose(np.asarray(out.embedding[0]),
                               np.asarray(ref_state.embedding),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('k,p', [(5, None), (None, 0.9), (3, 0.7),
                                 (None, None)])
def test_topk_topp_matches_reference(k, p):
    ref_s = ref_module('hqvae.utils.sampling')
    rng = np.random.RandomState(42)
    logits = rng.randn(4, 50).astype(np.float32) * 3

    t_logits = ref_s.cutoff_topk_logits(torch.from_numpy(logits.copy()), k)
    t_probs = torch.softmax(t_logits, dim=-1)
    t_probs = ref_s.cutoff_topp_probs(t_probs, p)

    j_logits = tkp.cutoff_topk_logits(jnp.asarray(logits), k)
    j_probs = jax.nn.softmax(j_logits, axis=-1)
    j_probs = tkp.cutoff_topp_probs(j_probs, p)

    np.testing.assert_allclose(t_probs.numpy(), np.asarray(j_probs),
                               atol=1e-6, rtol=1e-5)


def test_pixel_shuffle_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 12).astype(np.float32)
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    t_down = torch.nn.PixelUnshuffle(2)(x_t).numpy()
    j_down = np.transpose(np.asarray(rs.pixel_unshuffle(jnp.asarray(x), 2)),
                          (0, 3, 1, 2))
    np.testing.assert_array_equal(t_down, j_down)

    t_up = torch.nn.PixelShuffle(2)(torch.from_numpy(t_down)).numpy()
    j_up = np.transpose(
        np.asarray(rs.pixel_shuffle(rs.pixel_unshuffle(jnp.asarray(x), 2), 2)),
        (0, 3, 1, 2))
    np.testing.assert_array_equal(t_up, j_up)


def test_soft_codes_match_reference():
    ref_q = ref_module('hqvae.models.stage1.modules.quantizer')
    torch.manual_seed(2)
    tm = ref_q.EMAVectorQuantizer(dim=8, n_embed=16, beta=0.25)
    tm.eval()
    rng = np.random.RandomState(3)
    z = rng.randn(2, 8, 4, 4).astype(np.float32)
    with torch.no_grad():
        _, _, t_code, t_soft = tm.get_soft_codes(torch.from_numpy(z),
                                                 temp=0.7)
    z_flat = np.transpose(z, (0, 2, 3, 1)).reshape(-1, 8)
    j_code, j_soft = q.soft_codes(jnp.asarray(z_flat),
                                  jnp.asarray(tm.embedding.numpy()), 0.7)
    np.testing.assert_array_equal(t_code.numpy(), np.asarray(j_code))
    np.testing.assert_allclose(t_soft.numpy(), np.asarray(j_soft),
                               atol=1e-5, rtol=1e-4)
