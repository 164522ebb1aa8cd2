"""Coverage for the serving-path machinery the bench rides on:

- `make_pipelined_sampler` (bench.py's steady-state path): its AR codes must
  equal the plain sampler's for the same key, and its pixel output must be
  the DECODE OF THE PREVIOUS call's codes (software pipeline semantics).
- cache segmentation (`n_segments`): pure scheduling, must not change codes.
- chunked conv decode: chunking (with padding for non-divisible batches)
  must be a no-op on the pixels.
- opt-in A8W8 int8 decode (HQT_INT8_DECODE=1): close to the bf16 decode.

The reference has no pipelined/segmented/int8 analogue (its harness decodes
after the AR loop per batch, `measure_throughput/__main__.py:140-180`);
these are TPU-serving additions, so they are pinned against this repo's own
plain path rather than against torch.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_CFG = os.path.join(REPO, 'configs', 'tiny', 'stage2-tiny.yaml')

SP = SamplingParams(top_k_top=16, top_k_bot=16,
                    temperature_top=0.95, temperature_bot=0.95)


@pytest.fixture(scope='module')
def tiny_model():
    cfg = build_twostage_config(TINY_CFG)
    model = TwoStageModel(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def test_pipelined_matches_plain_and_lags_one_batch(tiny_model):
    model, variables = tiny_model
    B = 4
    labels = jnp.arange(B, dtype=jnp.int32) % 10
    plain = model.make_pixel_sampler(params=SP)
    piped = model.make_pipelined_sampler(params=SP)

    k0, k1 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    px0, (ct0, cb0) = plain(variables, k0, labels)
    px1, (ct1, cb1) = plain(variables, k1, labels)

    # pipeline fill: decodes its own codes
    codes0, fill_px = piped(variables, k0, labels, None)
    np.testing.assert_array_equal(np.asarray(codes0[0]), np.asarray(ct0))
    np.testing.assert_array_equal(np.asarray(codes0[1]), np.asarray(cb0))
    np.testing.assert_allclose(np.asarray(fill_px), np.asarray(px0),
                               atol=1e-5)

    # steady state: samples batch 1 while decoding batch 0's codes
    codes1, lag_px = piped(variables, k1, labels, codes0)
    np.testing.assert_array_equal(np.asarray(codes1[0]), np.asarray(ct1))
    np.testing.assert_array_equal(np.asarray(codes1[1]), np.asarray(cb1))
    np.testing.assert_allclose(np.asarray(lag_px), np.asarray(px0),
                               atol=1e-5)


@pytest.mark.parametrize('attention', ['einsum', 'packed'])
def test_cache_segments_do_not_change_codes(tiny_model, attention):
    """Segmentation is pure scheduling on both cache layouts: growing
    static caches on the einsum path, a single full-size cache with static
    per-segment compute bounds (t_compute) on the packed path."""
    model, variables = tiny_model
    labels = jnp.asarray([1, 2, 3], jnp.int32)
    key = jax.random.PRNGKey(3)
    outs = []
    for n_segments in (1, 2, 4):
        sampler = make_hierarchical_sampler(model.stage2, params=SP,
                                            n_segments=n_segments,
                                            attention=attention)
        outs.append(sampler(variables['stage2'], key, labels))
    for ct, cb in outs[1:]:
        np.testing.assert_array_equal(np.asarray(ct), np.asarray(outs[0][0]))
        np.testing.assert_array_equal(np.asarray(cb), np.asarray(outs[0][1]))


def test_packed_and_einsum_paths_agree_f32(tiny_model):
    """In f32 the packed-cache path (XLA oracle on CPU — same math as the
    kernel, which test_pallas_attention pins in interpret mode) must emit
    the einsum path's exact token streams (README 'RNG discipline')."""
    model, variables = tiny_model
    labels = jnp.asarray([4, 5], jnp.int32)
    key = jax.random.PRNGKey(7)
    a = make_hierarchical_sampler(model.stage2, params=SP,
                                  attention='einsum')(
        variables['stage2'], key, labels)
    b = make_hierarchical_sampler(model.stage2, params=SP,
                                  attention='packed')(
        variables['stage2'], key, labels)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_chunked_decode_is_a_noop(tiny_model):
    model, variables = tiny_model
    B = 5                                   # not a multiple of the chunk
    labels = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(4)
    px_whole, codes = model.make_pixel_sampler(params=SP, decode_chunk=64)(
        variables, key, labels)
    px_chunk, codes2 = model.make_pixel_sampler(params=SP, decode_chunk=2)(
        variables, key, labels)
    np.testing.assert_array_equal(np.asarray(codes[0]), np.asarray(codes2[0]))
    np.testing.assert_allclose(np.asarray(px_chunk), np.asarray(px_whole),
                               atol=1e-5)


def test_int8_decode_close_to_float(tiny_model):
    from hqtransformer_tpu.models.stage1.layers import int8_decode_scope
    model, variables = tiny_model
    # int8 gate requires bf16 activations (serving dtype)
    cfg = build_twostage_config(TINY_CFG)
    bf16_model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    ct = jax.random.randint(jax.random.PRNGKey(5), (2, 8, 8), 0, 256)
    cb = jax.random.randint(jax.random.PRNGKey(6), (2, 16, 16), 0, 256)

    def decode(scoped=True):
        def run():
            px = bf16_model.stage1.apply(
                variables['stage1'], ct, cb,
                method=type(bf16_model.stage1).decode_code)
            return np.asarray(jnp.clip(px * 0.5 + 0.5, 0, 1), np.float32)
        if scoped:
            with int8_decode_scope():
                return run()
        return run()

    assert os.environ.get('HQT_INT8_DECODE') != '1'
    ref = decode()                      # scope without env var: bf16 path
    os.environ['HQT_INT8_DECODE'] = '1'
    try:
        got = decode()
        # env var WITHOUT the serving scope must not engage (the flag can
        # never leak into encoders / training / eval reconstructions)
        unscoped = decode(scoped=False)
    finally:
        del os.environ['HQT_INT8_DECODE']
    np.testing.assert_array_equal(unscoped, ref)
    assert got.shape == ref.shape
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # random-init weights; measured flagship PSNR is 34 dB vs bf16 — just
    # pin "quantization engaged and sane", not production quality
    assert psnr > 20.0, psnr
    assert not np.array_equal(got, ref)     # the int8 path actually ran


def test_int8_static_scales_decode(tiny_model):
    """Calibrated (static-scale) A8W8: calibrate_int8_decode records each
    conv's activation absmax and the decode then consumes 'act_scales'
    instead of computing dynamic per-call maxima. On the calibration batch
    itself the static path must track the bf16 decode as closely as the
    dynamic path (identical quantization grid up to the scale source)."""
    from hqtransformer_tpu.models.stage1.layers import int8_decode_scope
    model, variables = tiny_model
    cfg = build_twostage_config(TINY_CFG)
    bf16_model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    ct = jax.random.randint(jax.random.PRNGKey(5), (2, 8, 8), 0, 256)
    cb = jax.random.randint(jax.random.PRNGKey(6), (2, 16, 16), 0, 256)

    calibrated = bf16_model.calibrate_int8_decode(variables, ct, cb)
    scales = calibrated['stage1']['act_scales']
    leaves = jax.tree.leaves(scales)
    assert leaves and all(float(s) > 0 for s in leaves)
    # calibration must not touch the weights
    assert calibrated['stage1']['params'] is variables['stage1']['params']

    def decode(vars1):
        with int8_decode_scope():
            px = bf16_model.stage1.apply(
                vars1, ct, cb, method=type(bf16_model.stage1).decode_code)
        return np.asarray(jnp.clip(px * 0.5 + 0.5, 0, 1), np.float32)

    assert os.environ.get('HQT_INT8_DECODE') != '1'
    ref = decode(variables['stage1'])          # bf16 (env var off)
    os.environ['HQT_INT8_DECODE'] = '1'
    try:
        static = decode(calibrated['stage1'])
        dynamic = decode(variables['stage1'])
    finally:
        del os.environ['HQT_INT8_DECODE']

    for got in (static, dynamic):
        mse = float(np.mean((got - ref) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 20.0, psnr
    assert not np.array_equal(static, ref)   # a quantized path ran
    # pin that the static path actually CONSUMES 'act_scales' (a silent
    # fallback to the dynamic branch would also pass the asserts above):
    # corrupting the scales must visibly change the output
    bad = {**calibrated['stage1'],
           'act_scales': jax.tree.map(lambda s: s * 1000.0, scales)}
    os.environ['HQT_INT8_DECODE'] = '1'
    try:
        static_bad = decode(bad)
    finally:
        del os.environ['HQT_INT8_DECODE']
    assert not np.array_equal(static_bad, static)


def test_int8_decode_calibration_chunking(tiny_model):
    """Chunked calibration (chunk < B) yields the SAME scales as a single
    pass: scale = absmax/127 is monotone, chunks merge by maximum. The
    chunking exists because an unchunked 256-sample calibration decode
    holds ~8 GB of 256^2 conv activations — the RESOURCE_EXHAUSTED behind
    the int8 family-row calibration (twostage.calibrate_int8_decode)."""
    model, variables = tiny_model
    cfg = build_twostage_config(TINY_CFG)
    bf16_model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    ct = jax.random.randint(jax.random.PRNGKey(7), (5, 8, 8), 0, 256)
    cb = jax.random.randint(jax.random.PRNGKey(8), (5, 16, 16), 0, 256)
    one = bf16_model.calibrate_int8_decode(variables, ct, cb, chunk=8)
    split = bf16_model.calibrate_int8_decode(variables, ct, cb, chunk=2)
    a = jax.tree.leaves(one['stage1']['act_scales'])
    b = jax.tree.leaves(split['stage1']['act_scales'])
    assert a and len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
