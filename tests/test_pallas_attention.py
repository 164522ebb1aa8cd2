"""Pallas fused decode-attention kernel vs the XLA oracle (interpret mode
on CPU; the same kernel compiles on TPU where `sampling/engine.py` uses it
for the spatial decode step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hqtransformer_tpu.ops.pallas_attention import (decode_attention_step,
                                                    decode_attention_step_xla)


@pytest.mark.parametrize('layer,pos', [(0, 0), (1, 5), (2, 31)])
def test_kernel_matches_xla_oracle(layer, pos):
    B, T, D, NH, L = 64, 32, 256, 4, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    kc = jax.random.normal(ks[0], (L, T, B, D), jnp.float32)
    vc = jax.random.normal(ks[1], (L, T, B, D), jnp.float32)
    q = jax.random.normal(ks[2], (B, D), jnp.float32)
    kn = jax.random.normal(ks[3], (B, D), jnp.float32)
    vn = jax.random.normal(ks[4], (B, D), jnp.float32)

    y1, kc1, vc1 = decode_attention_step(q, kn, vn, kc, vc, layer, pos, NH,
                                         block_b=32, interpret=True)
    y2, kc2, vc2 = decode_attention_step_xla(q, kn, vn, kc, vc, layer, pos,
                                             NH)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(kc1), np.asarray(kc2))
    np.testing.assert_array_equal(np.asarray(vc1), np.asarray(vc2))


@pytest.mark.parametrize('t_compute,pos', [(8, 3), (16, 7), (24, 23)])
def test_kernel_t_compute_bounds_compute_only(t_compute, pos):
    """With a full-size cache buffer and a static per-segment compute bound
    (the no-copy segment scheme in sampling/engine.py), the kernel must
    match the full-T oracle exactly: rows at/beyond t_compute hold garbage
    the kernel may never read."""
    B, T, D, NH, L = 32, 32, 256, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    # poison the tail: NaNs beyond t_compute must not reach the output
    kc = jax.random.normal(ks[0], (L, T, B, D), jnp.float32)
    vc = jax.random.normal(ks[1], (L, T, B, D), jnp.float32)
    kc = kc.at[:, t_compute:].set(jnp.nan)
    vc = vc.at[:, t_compute:].set(jnp.nan)
    q = jax.random.normal(ks[2], (B, D), jnp.float32)
    kn = jax.random.normal(ks[3], (B, D), jnp.float32)
    vn = jax.random.normal(ks[4], (B, D), jnp.float32)

    y1, kc1, vc1 = decode_attention_step(q, kn, vn, kc, vc, 1, pos, NH,
                                         block_b=32, interpret=True,
                                         t_compute=t_compute)
    assert np.isfinite(np.asarray(y1)).all()
    # oracle over the valid prefix only
    y2, kc2, vc2 = decode_attention_step_xla(
        q, kn, vn, kc[:, :t_compute], vc[:, :t_compute], 1, pos, NH)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(kc1[:, :t_compute]),
                                  np.asarray(kc2))
    np.testing.assert_array_equal(np.asarray(vc1[:, :t_compute]),
                                  np.asarray(vc2))


def test_oracle_matches_perhead_attention():
    """The packed-layout oracle itself must equal plain per-head cached
    attention (guards the head-slicing convention)."""
    B, T, D, NH = 8, 16, 64, 4
    hd = D // NH
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    kc = jax.random.normal(ks[0], (1, T, B, D), jnp.float32)
    vc = jax.random.normal(ks[1], (1, T, B, D), jnp.float32)
    q = jax.random.normal(ks[2], (B, D), jnp.float32)
    kn = jax.random.normal(ks[3], (B, D), jnp.float32)
    vn = jax.random.normal(ks[4], (B, D), jnp.float32)
    pos = 7

    y, kc2, _ = decode_attention_step_xla(q, kn, vn, kc, vc, 0, pos, NH)

    kh = kc2[0].reshape(T, B, NH, hd).transpose(1, 2, 0, 3)
    vh = jax.lax.dynamic_update_slice(
        vc, vn[None, None], (0, pos, 0, 0))[0].reshape(
        T, B, NH, hd).transpose(1, 2, 0, 3)
    qh = q.reshape(B, NH, 1, hd)
    att = jnp.einsum('bhqd,bhkd->bhqk', qh, kh) / np.sqrt(hd)
    att = jnp.where((jnp.arange(T) <= pos)[None, None, None], att, -1e10)
    att = jax.nn.softmax(att, axis=-1)
    yref = jnp.einsum('bhqk,bhkd->bhqd', att, vh)
    yref = yref.transpose(0, 2, 1, 3).reshape(B, D)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               atol=1e-5, rtol=1e-5)
