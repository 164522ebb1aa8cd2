"""Gradient rematerialization (main_stage2.py --remat): nn.remat on the
transformer blocks must leave the param tree, gradients, and samplers
bit-identical — it only trades backward-pass memory for recompute. No
reference analogue (torch would use torch.utils.checkpoint)."""

import numpy as np

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import parse_model_type
from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT

from test_sampler import tiny_hparams


def test_remat_grads_bit_identical():
    spec = parse_model_type('hq-transformer/parallel')
    kw = dict(vocab_size_top=64, vocab_size_bot=64, vocab_size_txt=32,
              ratio_bot2top=4, use_cls_cond=True, use_txt_cond=False,
              model_type=spec, hparams=tiny_hparams(n_layers=1))
    m0 = HierarchicalGPT(**kw)
    m1 = HierarchicalGPT(**kw, remat=True)
    B, Ttop = 2, 16
    labels = jnp.asarray([3, 7])
    ct = jnp.zeros((B, Ttop), jnp.int32)
    cb = jnp.zeros((B, Ttop * 4), jnp.int32)
    v0 = m0.init(jax.random.PRNGKey(0), ct, cb, labels)
    v1 = m1.init(jax.random.PRNGKey(0), ct, cb, labels)
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()),
                                     v0, v1))

    def loss(m, v):
        lt, lb = m.apply(v, ct, cb, labels)
        return (jnp.mean(lt.astype(jnp.float32) ** 2) +
                jnp.mean(lb.astype(jnp.float32) ** 2))

    g0 = jax.grad(lambda v: loss(m0, v))(v0)
    g1 = jax.grad(lambda v: loss(m1, v))(v1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
