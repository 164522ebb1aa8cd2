"""Fused top-k sampling kernel (interpret mode): greedy limit, kept-set
exactness, and distributional agreement with the XLA pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hqtransformer_tpu.ops.pallas_sample import sample_topk_pallas
from hqtransformer_tpu.ops.topk_topp import cutoff_topk_logits


def test_greedy_equals_argmax():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(64, 512).astype(np.float32) * 3)
    out = sample_topk_pallas(jax.random.PRNGKey(0), logits,
                             temperature=1e-6, top_k=50, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_draws_within_exact_topk_set():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(32, 300).astype(np.float32) * 2)
    filt = cutoff_topk_logits(logits, 40, use_bisect=False)
    for seed in range(10):
        out = sample_topk_pallas(jax.random.PRNGKey(seed), logits,
                                 top_k=40, interpret=True)
        vals = jnp.take_along_axis(filt, out[:, None], axis=-1)
        assert bool((vals > -1e9).all()), seed


def test_distribution_matches_reference():
    rng = np.random.RandomState(2)
    small = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    filt = cutoff_topk_logits(small, 8, use_bisect=False)
    probs_ref = np.asarray(jax.nn.softmax(
        jnp.where(filt < -1e9, -jnp.inf, small))[0])
    counts = np.zeros(16)
    n = 3000
    for seed in range(n):
        o = int(sample_topk_pallas(jax.random.PRNGKey(seed), small,
                                   top_k=8, interpret=True)[0])
        counts[o] += 1
    tv = np.abs(counts / n - probs_ref).sum() / 2
    assert tv < 0.05, tv
    assert counts[probs_ref == 0].sum() == 0  # never outside the top-k set


def test_leading_batch_dims():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(4, 6, 100).astype(np.float32))
    out = sample_topk_pallas(jax.random.PRNGKey(0), logits, top_k=10,
                             interpret=True)
    assert out.shape == (4, 6)


def test_bisect3_draws_identical_tokens():
    """The 3-probe bisection variant (HQT_SAMPLE_BISECT3) must draw the
    SAME tokens as the binary loop: both land the threshold in
    (v_{k+1}, v_k], so kept-set membership — the only thing the draw
    depends on — is identical, and the uniforms are shared."""
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(48, 384).astype(np.float32) * 3)
    for k in (1, 7, 96, 384):
        for seed in (0, 1):
            a = sample_topk_pallas(jax.random.PRNGKey(seed), logits,
                                   top_k=k, interpret=True, bisect3=False)
            b = sample_topk_pallas(jax.random.PRNGKey(seed), logits,
                                   top_k=k, interpret=True, bisect3=True)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f'k={k} seed={seed}')


def test_bisect3_kept_set_exact():
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(32, 300).astype(np.float32) * 2)
    filt = cutoff_topk_logits(logits, 40, use_bisect=False)
    for seed in range(5):
        out = sample_topk_pallas(jax.random.PRNGKey(seed), logits,
                                 top_k=40, interpret=True, bisect3=True)
        vals = jnp.take_along_axis(filt, out[:, None], axis=-1)
        assert bool((vals > -1e9).all()), seed
