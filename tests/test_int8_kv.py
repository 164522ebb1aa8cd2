"""int8 KV serving cache: per-channel quantized K/V rows with the dequant
scales folded outside the attention kernel (K's into q, V's into the
attention output). Pins (a) the kernel/oracle agreement on int8 caches,
(b) the quantizer's error bound, and (c) the end-to-end sampler: calibrated
int8-cache sampling must stay close to the float path token-for-token.

No reference analogue (its sampling attention runs fp16 autocast,
`hqvae/models/stage2/hierarchical_ar.py:445`); the float path remains the
parity-tested default.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import parse_model_type
from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT
from hqtransformer_tpu.models.stage2.layers import _quantize_rows
from hqtransformer_tpu.ops.pallas_attention import (decode_attention_step,
                                                    decode_attention_step_xla)
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler)

from test_sampler import tiny_hparams


def test_quantize_rows_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64)) * 3.0
    scale = jnp.max(jnp.abs(x), axis=0) / 127.0
    q = _quantize_rows(x, 1.0 / scale)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) -
                 np.asarray(x))
    # symmetric rounding: error <= scale/2 per channel
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()


@pytest.mark.parametrize('layer,pos', [(0, 3), (1, 17)])
def test_kernel_int8_cache_matches_xla_oracle(layer, pos):
    """Kernel (interpret) vs oracle on int8 caches: q stays float, K/V
    convert on read, the new row persists as the given int8 values."""
    B, T, D, NH, L = 32, 32, 256, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    kc = jax.random.randint(ks[0], (L, T, B, D), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[1], (L, T, B, D), -127, 128, jnp.int8)
    q = jax.random.normal(ks[2], (B, D), jnp.float32) * 0.05
    kn = jax.random.randint(ks[3], (B, D), -127, 128, jnp.int8)
    vn = jax.random.randint(ks[4], (B, D), -127, 128, jnp.int8)

    y1, kc1, vc1 = decode_attention_step(q, kn, vn, kc, vc, layer, pos, NH,
                                         block_b=32, interpret=True)
    y2, kc2, vc2 = decode_attention_step_xla(q, kn, vn, kc, vc, layer, pos,
                                             NH)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(kc1), np.asarray(kc2))
    np.testing.assert_array_equal(np.asarray(vc1), np.asarray(vc2))


def _tiny_model_and_vars():
    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=True, use_txt_cond=False,
                            model_type=spec, hparams=tiny_hparams())
    B, Ttop = 8, 16
    labels = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)
    return model, variables, labels, Ttop


def _kv_scales_from_run(model, variables, labels, Ttop):
    """Engine-level equivalent of twostage.calibrate_kv_scales for a bare
    stage-2 model (the TwoStageModel wrapper needs a stage-1 config)."""
    sampler = make_hierarchical_sampler(model, Ttop, SamplingParams(),
                                        _return_caches=True)
    _, (kc, vc) = sampler(variables, jax.random.PRNGKey(3), labels)

    def channel_absmax(c):
        if c.ndim == 4:
            m = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=(1, 2))
        else:
            L, B, nh, T, hd = c.shape
            m = jnp.max(jnp.abs(c.astype(jnp.float32)),
                        axis=(1, 3)).reshape(L, nh * hd)
        return jnp.maximum(m, 1e-6) / 127.0

    ks, vs = channel_absmax(kc), channel_absmax(vc)
    return {f'blocks_{i}': {'attn': {'k': ks[i], 'v': vs[i]}}
            for i in range(model.hparams.n_layers)}


def test_int8_kv_sampler_tracks_float_path():
    """Calibrated int8-cache sampling (packed layout, XLA oracle on CPU)
    agrees with the float packed path on nearly every token at a finite
    temperature — the serving-mode quality guard."""
    model, variables, labels, Ttop = _tiny_model_and_vars()
    sp = SamplingParams(temperature_top=0.9, temperature_bot=0.9,
                        top_k_top=16, top_k_bot=16)
    key = jax.random.PRNGKey(7)

    ref = make_hierarchical_sampler(model, Ttop, sp, attention='packed')
    ct_f, cb_f = ref(variables, key, labels)

    scales = _kv_scales_from_run(model, variables, labels, Ttop)
    vars_q = {**variables, 'kv_scales': scales}
    q8 = make_hierarchical_sampler(model, Ttop, sp, attention='packed',
                                   cache_dtype=jnp.int8)
    ct_q, cb_q = q8(vars_q, key, labels)

    assert ct_q.shape == ct_f.shape and cb_q.shape == cb_f.shape
    agree_t = float(np.mean(np.asarray(ct_q) == np.asarray(ct_f)))
    agree_b = float(np.mean(np.asarray(cb_q) == np.asarray(cb_f)))
    # int8 K/V perturbs scores by <= ~1% of their range; the same-key draws
    # should pick the same tokens nearly everywhere on a tiny model
    assert agree_t > 0.85, agree_t
    assert agree_b > 0.85, agree_b


def test_int8_kv_requires_calibration():
    model, variables, labels, Ttop = _tiny_model_and_vars()
    q8 = make_hierarchical_sampler(model, Ttop, SamplingParams(),
                                   attention='packed',
                                   cache_dtype=jnp.int8)
    with pytest.raises(ValueError, match='calibrate_kv_scales'):
        q8(variables, jax.random.PRNGKey(0), labels)


def test_int8_stage2_depth_gemms_track_float_path():
    """Opt-in A8W8 depth-chain gemms (HQT_INT8_STAGE2=1 inside the engine's
    int8_stage2_scope): calibrated via the training forward, the sampler's
    token stream stays close to the bf16 path; without the scope+env the
    QuantizableDense modules are exact nn.Dense."""
    import os

    from hqtransformer_tpu.models.stage2.hierarchical import cells_to_raster

    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=True, use_txt_cond=False,
                            model_type=spec, hparams=tiny_hparams(),
                            dtype=jnp.bfloat16)
    B, Ttop = 8, 16
    labels = jnp.arange(1, B + 1, dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)

    sp = SamplingParams(temperature_top=0.9, temperature_bot=0.9,
                        top_k_top=16, top_k_bot=16)
    key = jax.random.PRNGKey(7)
    ref = make_hierarchical_sampler(model, Ttop, sp, attention='packed')
    ct_f, cb_f = ref(variables, key, labels)

    # calibrate on the sampled codes (teacher-forced forward)
    from hqtransformer_tpu.models.stage1.layers import (
        int8_calibration_scope, int8_scales_from_calib)
    cb_raster = cells_to_raster(cb_f, 4, 2).reshape(B, -1)
    with int8_calibration_scope():
        _, col = model.apply(variables, ct_f, cb_raster, labels,
                             mutable=['int8_calib'])
    vars_q = {**variables,
              'act_scales': int8_scales_from_calib(col['int8_calib'])}

    os.environ['HQT_INT8_STAGE2'] = '1'
    try:
        q8 = make_hierarchical_sampler(model, Ttop, sp, attention='packed')
        ct_q, cb_q = q8(vars_q, key, labels)
    finally:
        os.environ['HQT_INT8_STAGE2'] = '0'

    # int8 perturbs the depth-second (bottom) logits; a changed bottom
    # token feeds the NEXT spatial step's cell embedding, so divergence
    # cascades autoregressively — token agreement is a loose guard here
    # (measured ~0.84 tops / ~0.8 bottoms on this tiny model); the real
    # quality statement is distribution-level (serving_quality_delta.py)
    agree_t = float(np.mean(np.asarray(ct_q) == np.asarray(ct_f)))
    agree_b = float(np.mean(np.asarray(cb_q) == np.asarray(cb_f)))
    assert ct_q.shape == ct_f.shape and cb_q.shape == cb_f.shape
    assert agree_t > 0.6, agree_t
    assert agree_b > 0.6, agree_b


def test_int8_spatial_gemms_track_float_path():
    """HQT_INT8_SPATIAL=1 (+ HQT_INT8_STAGE2=1) extends the A8W8 gemms to
    the SPATIAL transformer steps via the same scoped QuantizableDense
    machinery; the sampler must keep tracking the bf16 path. Spatial
    perturbations feed every later step's cache, so divergence cascades
    harder than the depth-only mode (measured ~0.77 tops / ~0.75 bottoms
    on this tiny model) — the bound is loose; the distribution-level
    statement is scripts/serving_quality_delta.py."""
    import os

    from hqtransformer_tpu.models.stage2.hierarchical import cells_to_raster

    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=True, use_txt_cond=False,
                            model_type=spec, hparams=tiny_hparams(),
                            dtype=jnp.bfloat16)
    B, Ttop = 8, 16
    labels = jnp.arange(1, B + 1, dtype=jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)

    sp = SamplingParams(temperature_top=0.9, temperature_bot=0.9,
                        top_k_top=16, top_k_bot=16)
    key = jax.random.PRNGKey(7)
    ref = make_hierarchical_sampler(model, Ttop, sp, attention='packed')
    ct_f, cb_f = ref(variables, key, labels)

    from hqtransformer_tpu.models.stage1.layers import (
        int8_calibration_scope, int8_scales_from_calib)
    cb_raster = cells_to_raster(cb_f, 4, 2).reshape(B, -1)
    with int8_calibration_scope():
        _, col = model.apply(variables, ct_f, cb_raster, labels,
                             mutable=['int8_calib'])
    vars_q = {**variables,
              'act_scales': int8_scales_from_calib(col['int8_calib'])}

    os.environ['HQT_INT8_STAGE2'] = '1'
    os.environ['HQT_INT8_SPATIAL'] = '1'
    try:
        q8 = make_hierarchical_sampler(model, Ttop, sp, attention='packed')
        ct_q, cb_q = q8(vars_q, key, labels)
    finally:
        os.environ['HQT_INT8_STAGE2'] = '0'
        os.environ['HQT_INT8_SPATIAL'] = '0'

    agree_t = float(np.mean(np.asarray(ct_q) == np.asarray(ct_f)))
    agree_b = float(np.mean(np.asarray(cb_q) == np.asarray(cb_f)))
    assert ct_q.shape == ct_f.shape and cb_q.shape == cb_f.shape
    print(f'agree_t={agree_t:.3f} agree_b={agree_b:.3f}')
    assert agree_t > 0.5, agree_t
    assert agree_b > 0.5, agree_b
