"""3-level HQTransformer: forward parity vs the torch reference, and greedy
sampler self-consistency with the training forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import Stage2Hparams
from hqtransformer_tpu.checkpoint import convert_torch_state_dict
from hqtransformer_tpu.models.stage2.multilevel import (
    MultiLevelHQTransformer, cells_to_level, level_cells)
from hqtransformer_tpu.sampling.engine import make_multilevel_sampler
from reference_loader import NSDict, ref_module

VOCABS = [32, 48, 64]


def tiny_hparams(**over):
    hp = dict(embed_dim=64, n_layers=2, n_heads=4, n_dense_layers=2,
              ctx_len=None, ctx_len_img=16, ctx_len_txt=8, embd_pdrop=0.0,
              resid_pdrop=0.0, attn_pdrop=0.0, mlp_bias=True, attn_bias=True,
              gelu_use_approx=False, use_head_txt=True, n_classes=10,
              causal_attn=None, embedding_type='transformer1',
              position_embedding='1d', bottom_head_type='linear',
              use_random_order=False, rate_random_order=1.0)
    hp.update(over)
    return hp


def build_pair(decoding_type, use_cls=True, use_txt=False, **hp_over):
    ref_h = ref_module('hqvae.models.stage2.hqtransformer')
    hp = tiny_hparams(**hp_over)
    torch.manual_seed(0)
    tm = ref_h.HQTransformer(vocab_sizes=VOCABS, vocab_size_txt=16,
                             decoding_type=decoding_type,
                             use_cls_cond=use_cls, use_txt_cond=use_txt,
                             hparams=NSDict(hp), hparams_dec=None)
    tm.eval()
    jm = MultiLevelHQTransformer(vocab_sizes=tuple(VOCABS),
                                 vocab_size_txt=16,
                                 decoding_type=decoding_type,
                                 use_cls_cond=use_cls, use_txt_cond=use_txt,
                                 hparams=Stage2Hparams(**hp),
                                 hparams_dec=None)
    return tm, jm


def make_codes(B=2, Ttop=16, seed=1):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, VOCABS[0], (B, Ttop)),
            rng.randint(0, VOCABS[1], (B, Ttop * 4)),
            rng.randint(0, VOCABS[2], (B, Ttop * 16))]


# NOTE: only these two decoding types have a working training forward in the
# reference: plain 'parallel' never appends the level-2 depth inputs (the
# append sits inside the 'add' branch, `hqtransformer.py:383-386`) and 'tree'
# hits `assert False` (`hqtransformer.py:380-381`). Our implementation
# generalizes; parity is checked on the working variants.
@pytest.mark.parametrize('decoding_type', ['parallel-add', 'top2mid2bot'])
def test_forward_parity(decoding_type):
    tm, jm = build_pair(decoding_type)
    codes = make_codes()
    labels = np.asarray([3, 7])

    variables = jm.init(jax.random.PRNGKey(0),
                        [jnp.asarray(c) for c in codes],
                        jnp.asarray(labels))
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    variables = convert_torch_state_dict(sd, variables)

    with torch.no_grad():
        t_logits = tm([torch.from_numpy(c) for c in codes],
                      torch.from_numpy(labels))
    j_logits = jm.apply(variables, [jnp.asarray(c) for c in codes],
                        jnp.asarray(labels))
    assert len(t_logits) == len(j_logits) == 3
    for i, (t, j) in enumerate(zip(t_logits, j_logits)):
        np.testing.assert_allclose(t.numpy(), np.asarray(j), atol=3e-4,
                                   rtol=1e-3, err_msg=f'level {i}')


def test_greedy_sampler_matches_forward():
    _, jm = build_pair('parallel-add')
    B, Ttop = 2, 16
    labels = jnp.asarray([1, 4])
    codes = [jnp.zeros((B, Ttop), jnp.int32),
             jnp.zeros((B, Ttop * 4), jnp.int32),
             jnp.zeros((B, Ttop * 16), jnp.int32)]
    variables = jm.init(jax.random.PRNGKey(0), codes, labels)
    sampler = make_multilevel_sampler(jm, max_seq_len=Ttop,
                                      temperature=(1e-6, 1e-6, 1e-6))
    tops, mids, bots = sampler(variables, jax.random.PRNGKey(1), labels)
    assert tops.shape == (B, Ttop)
    assert mids.shape == (B, Ttop, 4)
    assert bots.shape == (B, Ttop, 16)

    mid_raster = cells_to_level(mids, 4, 2)
    bot_raster = cells_to_level(bots, 4, 4)
    logits = jm.apply(variables, [tops, mid_raster, bot_raster], labels)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits[0], -1)),
                                  np.asarray(tops))
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits[1], -1)),
                                  np.asarray(mid_raster))
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits[2], -1)),
                                  np.asarray(bot_raster))


def test_multilevel_packed_attention_matches_einsum():
    """Packed-cache spatial decode (Pallas kernel on TPU, XLA oracle here)
    must reproduce the einsum path's token streams for the 3-level model."""
    _, jm = build_pair('parallel-add', ctx_len_img=4)
    B, Ttop = 8, 4
    labels = jnp.arange(B, dtype=jnp.int32) % 10
    codes = [jnp.zeros((B, Ttop), jnp.int32),
             jnp.zeros((B, Ttop * 4), jnp.int32),
             jnp.zeros((B, Ttop * 16), jnp.int32)]
    variables = jm.init(jax.random.PRNGKey(0), codes, labels)
    key = jax.random.PRNGKey(3)
    kw = dict(top_k=(8, 8, 8), temperature=(0.9, 0.9, 0.9))
    s_e = make_multilevel_sampler(jm, Ttop, attention='einsum', **kw)
    s_p = make_multilevel_sampler(jm, Ttop, attention='packed', **kw)
    a = s_e(variables, key, labels)
    b = s_p(variables, key, labels)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_multilevel_segments_do_not_change_codes():
    """The no-copy segmented scan (n_segments, packed t_compute bounds) is
    a pure compute optimization: identical token streams for 1 vs 3
    segments on the packed path (mirrors the 2-level guard in
    test_pipelined_sampler.py)."""
    _, jm = build_pair('parallel-add', ctx_len_img=4)
    B, Ttop = 8, 4
    labels = jnp.arange(B, dtype=jnp.int32) % 10
    codes = [jnp.zeros((B, Ttop), jnp.int32),
             jnp.zeros((B, Ttop * 4), jnp.int32),
             jnp.zeros((B, Ttop * 16), jnp.int32)]
    variables = jm.init(jax.random.PRNGKey(0), codes, labels)
    key = jax.random.PRNGKey(5)
    outs = []
    for n_seg in (1, 3):
        s = make_multilevel_sampler(jm, Ttop, top_k=(8, 8, 8),
                                    temperature=(0.9, 0.9, 0.9),
                                    n_segments=n_seg, attention='packed')
        outs.append(s(variables, key, labels))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_depth_matches_recompute():
    """The KV-cached depth decode (depth_phase_cached, the serving default)
    emits the same greedy token stream as the reference-shaped prefix
    recompute (HQT_ML_DEPTH_RECOMPUTE=1) — the two are the same math."""
    import os

    _, jm = build_pair('parallel-add')
    B, Ttop = 4, 16
    labels = jnp.asarray([1, 2, 3, 4])
    codes = [jnp.asarray(c) for c in make_codes(B)]
    variables = jm.init(jax.random.PRNGKey(0), codes, labels)

    kw = dict(top_k=(1, 1, 1))
    cached = make_multilevel_sampler(jm, Ttop, **kw)
    t1, m1, b1 = cached(variables, jax.random.PRNGKey(9), labels)
    os.environ['HQT_ML_DEPTH_RECOMPUTE'] = '1'
    try:
        recompute = make_multilevel_sampler(jm, Ttop, **kw)
        t2, m2, b2 = recompute(variables, jax.random.PRNGKey(9), labels)
    finally:
        del os.environ['HQT_ML_DEPTH_RECOMPUTE']
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
