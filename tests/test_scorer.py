"""Teacher-forced serving-path scorer (engine.make_hierarchical_scorer):
per-step logits computed through the cached decode machinery must equal the
training forward (`hierarchical_ar.py:246-426`) — the scorer is the
measurement instrument for the int8max serving-quality evidence
(scripts/int8_agreement.py), so it must itself be exact in f32.
"""

import numpy as np
from einops import rearrange

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import parse_model_type
from hqtransformer_tpu.models.stage2.hierarchical import (HierarchicalGPT,
                                                          cells_to_raster,
                                                          raster_to_cells)
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler,
                                               make_hierarchical_scorer)

from test_sampler import tiny_hparams


def _tiny(use_txt=False):
    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=not use_txt, use_txt_cond=use_txt,
                            model_type=spec, hparams=tiny_hparams())
    B, Ttop = 4, 16
    if use_txt:
        labels = jnp.ones((B, 8), jnp.int32)
    else:
        labels = jnp.asarray([1, 2, 3, 4])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)
    return model, variables, labels, B, Ttop


def test_scorer_matches_training_forward():
    model, variables, labels, B, Ttop = _tiny()
    rng = np.random.RandomState(3)
    ct = jnp.asarray(rng.randint(0, 64, (B, Ttop)), jnp.int32)
    cb_cells = jnp.asarray(rng.randint(0, 64, (B, Ttop, 4)), jnp.int32)
    cb_raster = cells_to_raster(cb_cells, 4, 2)

    lt_fwd, lb_fwd = model.apply(variables, ct, cb_raster, labels)
    for n_seg, attn in [(1, 'einsum'), (2, 'einsum'), (2, 'packed')]:
        scorer = make_hierarchical_scorer(model, Ttop, n_segments=n_seg,
                                          attention=attn)
        lt, lb = scorer(variables, labels, ct, cb_cells)
        assert lt.shape == (B, Ttop, 64) and lb.shape == (B, Ttop, 4, 64)
        # training-forward bottom logits come in raster order
        lb_r = rearrange(lb, 'B (H W) (h2 w2) K -> B (H h2 W w2) K',
                         H=4, W=4, h2=2, w2=2)
        np.testing.assert_allclose(np.asarray(lt), np.asarray(lt_fwd),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(lb_r), np.asarray(lb_fwd),
                                   atol=2e-4, rtol=2e-4)


def test_scorer_matches_training_forward_txt():
    model, variables, labels, B, Ttop = _tiny(use_txt=True)
    rng = np.random.RandomState(4)
    ct = jnp.asarray(rng.randint(0, 64, (B, Ttop)), jnp.int32)
    cb_cells = jnp.asarray(rng.randint(0, 64, (B, Ttop, 4)), jnp.int32)
    cb_raster = cells_to_raster(cb_cells, 4, 2)

    lt_fwd, lb_fwd, _ = model.apply(variables, ct, cb_raster, labels)
    scorer = make_hierarchical_scorer(model, Ttop)
    lt, lb = scorer(variables, labels, ct, cb_cells)
    lb_r = rearrange(lb, 'B (H W) (h2 w2) K -> B (H h2 W w2) K',
                     H=4, W=4, h2=2, w2=2)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lt_fwd),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lb_r), np.asarray(lb_fwd),
                               atol=2e-4, rtol=2e-4)


def test_scorer_scores_own_samples_consistently():
    """Sampling then scoring the sampled codes reproduces the sampler's
    decision problem: argmax of scorer logits at temperature->0 equals a
    greedy re-sample (self-consistency of the serving path)."""
    model, variables, labels, B, Ttop = _tiny()
    sp = SamplingParams(top_k_top=1, top_k_bot=1)  # greedy
    sampler = make_hierarchical_sampler(model, Ttop, sp)
    ct, cb = sampler(variables, jax.random.PRNGKey(5), labels)
    scorer = make_hierarchical_scorer(model, Ttop)
    lt, lb = scorer(variables, labels, ct, cb)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(lt, -1)),
                                  np.asarray(ct))
    np.testing.assert_array_equal(np.asarray(jnp.argmax(lb, -1)),
                                  np.asarray(cb))
