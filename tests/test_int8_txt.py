"""int8max serving surface for the TEXT-conditional 2-level model — the
exact calibration + sampling sequence measure_throughput.py runs for
`serving=int8max cond=txt` (the reference's measure_throughput_txt harness,
`/root/reference/measure_throughput_txt/__main__.py:51-180`), on a tiny
txt-cond TwoStageModel so the TPU family row can't hit an untraced path.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.stage2.hierarchical import cells_to_raster
from hqtransformer_tpu.models.twostage import TwoStageModel


def test_twostage_int8max_txt_surface():
    cfg = build_twostage_config(os.path.join(
        os.path.dirname(__file__), '..', 'configs', 'cc15m', 'stage2',
        'hqtransformer-l12-cc15m.yaml'))
    # shrink to demo_e2e --tiny scale, txt conditioning kept
    cfg.dataset.image_resolution = 64
    cfg.stage1.hparams.resolution = 64
    cfg.stage1.hparams.ch = 32
    cfg.stage1.hparams.ch_mult = [1, 2]
    cfg.stage1.hparams.z_channels = 64
    cfg.stage1.hparams.attn_resolutions = [16]
    cfg.stage1.embed_dim = 64
    cfg.stage1.n_embed = 64
    cfg.stage2.vocab_size_img = 64
    cfg.stage2.vocab_size_txt = 64
    cfg.stage2.hparams.embed_dim = 64
    cfg.stage2.hparams.n_layers = 2
    cfg.stage2.hparams.n_heads = 4
    cfg.stage2.hparams.ctx_len_img = 64
    cfg.stage2.hparams.ctx_len_txt = 8

    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    Ttop = model.top_res * model.top_res
    texts = jnp.ones((8, cfg.stage2.hparams.ctx_len_txt), jnp.int32)

    variables = model.calibrate_kv_scales(variables, jax.random.PRNGKey(2),
                                          texts, max_seq_len=Ttop)
    _, (ct0, cb0) = model.make_pixel_sampler(max_seq_len=Ttop)(
        variables, jax.random.PRNGKey(3), texts)
    tr = model.top_res
    r = tr * model.cell_win
    os.environ['HQT_INT8_DECODE'] = '1'
    os.environ['HQT_INT8_STAGE2'] = '1'
    os.environ['HQT_INT8_SPATIAL'] = '1'
    try:
        variables = model.calibrate_int8_decode(
            variables, ct0.reshape(-1, tr, tr),
            cells_to_raster(cb0, tr, model.cell_win).reshape(-1, r, r))
        variables = model.calibrate_stage2_int8(
            variables, ct0,
            cells_to_raster(cb0, tr, model.cell_win).reshape(
                ct0.shape[0], -1), texts)
        sampler = model.make_pixel_sampler(
            max_seq_len=Ttop, cache_dtype=jnp.int8, attention='packed')
        pixels, _ = sampler(variables, jax.random.PRNGKey(4), texts)
    finally:
        os.environ['HQT_INT8_DECODE'] = '0'
        os.environ['HQT_INT8_STAGE2'] = '0'
        os.environ['HQT_INT8_SPATIAL'] = '0'
    px = np.asarray(pixels, np.float32)
    assert px.shape[0] == 8 and np.isfinite(px).all()
    assert (px >= 0).all() and (px <= 1).all()
