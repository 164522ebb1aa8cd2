"""Published-checkpoint-layout fixtures: a synthetic FULL Lightning
state_dict — every `stage1.*` + `stage2.*` key the reference's two-stage
model produces (layout spec: SURVEY.md §5 'Checkpoint / resume';
`hqvae/models/stage2/hierarchical_ar.py:63-216`) in fp16, as released
checkpoints ship — must load end-to-end through
`TwoStageModel.load_reference_checkpoint`, sample, and round-trip back out
with key-set equality in BOTH directions.

The default-suite test runs at tiny shapes (full layout, every key class).
The flagship-shape fp16 fixture (L12 d=1536, real shapes) runs under
HQT_RUN_SLOW=1.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hqtransformer_tpu.checkpoint import (convert_torch_state_dict,
                                          export_torch_state_dict)
from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.sampling.engine import SamplingParams
from reference_loader import NSDict, ref_module

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, 'configs', 'imagenet', 'stage2',
                        'hqtransformer-l12-top8x8.yaml')


def _reference_state_dict(cfg, fp16=True, seed=0):
    """Instantiate the reference torch two-stage pair at `cfg`'s shapes and
    return the composed Lightning-layout state_dict ('stage1.*'/'stage2.*'
    keys, `hqvae/models/__init__.py:92-147`)."""
    ref_gen = ref_module('hqvae.models.stage1.generator')
    ref_h = ref_module('hqvae.models.stage2.hierarchical_ar')
    torch.manual_seed(seed)
    s1hp = {**cfg.stage1.hparams.__dict__}
    aux = dict(upsample=cfg.stage1.hparams_aux.upsample,
               shared_codebook=cfg.stage1.hparams_aux.shared_codebook,
               bottom_start=10 ** 11,
               decoding_type=cfg.stage1.hparams_aux.decoding_type,
               restart_unused_codes=None, code_levels=None)
    tm1 = ref_gen.SimRQGAN2Generator(
        n_embed=cfg.stage1.n_embed, embed_dim=cfg.stage1.embed_dim,
        ema_update=cfg.stage1.ema_update, hparams=NSDict(s1hp),
        hparams_aux=NSDict(aux))
    s2hp = {**cfg.stage2.hparams.__dict__}
    tm2 = ref_h.iHQGPT(vocab_size_top=cfg.stage2.vocab_size_img,
                       vocab_size_bot=cfg.stage2.vocab_size_img,
                       vocab_size_txt=cfg.stage2.vocab_size_txt,
                       ratio_bot2top=cfg.stage2.ratio_bot2top,
                       use_cls_cond=True, use_txt_cond=False,
                       model_type='parallel', hparams=NSDict(s2hp),
                       hparams_dec=None)
    sd = {}
    for prefix, tm in (('stage1.', tm1), ('stage2.', tm2)):
        for k, v in tm.state_dict().items():
            a = v.detach().to(torch.float16 if fp16 and v.is_floating_point()
                              else v.dtype).numpy().copy()
            sd[prefix + k] = a
    return sd


def _tiny_cfg():
    cfg = build_twostage_config(FLAGSHIP)
    cfg.dataset.image_resolution = 32
    cfg.stage1.hparams.resolution = 32
    cfg.stage1.hparams.ch = 32
    cfg.stage1.hparams.ch_mult = [1, 2]
    cfg.stage1.hparams.num_res_blocks = 1
    cfg.stage1.hparams.z_channels = 64
    cfg.stage1.hparams.attn_resolutions = [8]
    cfg.stage1.embed_dim = 64
    cfg.stage1.n_embed = 64
    cfg.stage2.vocab_size_img = 64
    cfg.stage2.hparams.embed_dim = 64
    cfg.stage2.hparams.n_layers = 2
    cfg.stage2.hparams.n_heads = 4
    cfg.stage2.hparams.n_dense_layers = 2
    cfg.stage2.hparams.ctx_len_img = 16
    return cfg


def _roundtrip(cfg, n_sample):
    sd = _reference_state_dict(cfg)
    assert any(k.startswith('stage1.') for k in sd)
    assert any(k.startswith('stage2.') for k in sd)
    assert any(v.dtype == np.float16 for v in sd.values())

    model = TwoStageModel(cfg)
    template = model.init_variables(jax.random.PRNGKey(0))
    loaded = model.load_reference_checkpoint(sd, template)

    # strict conversion already asserts full coverage; double-check the
    # export side reproduces the exact torch key set in both trees
    back = {}
    for stage in ('stage1', 'stage2'):
        for k, v in export_torch_state_dict(loaded[stage]).items():
            back[f'{stage}.{k}'] = v
    assert set(back) == set(sd), (
        sorted(set(sd) - set(back))[:5], sorted(set(back) - set(sd))[:5])
    for k in sd:
        np.testing.assert_allclose(
            np.asarray(sd[k], np.float32), np.asarray(back[k], np.float32),
            atol=0, rtol=0, err_msg=k)

    # sample from the loaded weights end-to-end
    sp = SamplingParams(top_k_top=32, top_k_bot=32)
    sampler = model.make_pixel_sampler(params=sp)
    pixels, _ = sampler(loaded, jax.random.PRNGKey(1),
                        jnp.zeros((n_sample,), jnp.int32))
    px = np.asarray(pixels, np.float32)
    assert np.isfinite(px).all() and px.shape[0] == n_sample


def test_full_lightning_layout_fp16_roundtrip_tiny():
    _roundtrip(_tiny_cfg(), n_sample=2)


@pytest.mark.skipif(os.environ.get('HQT_RUN_SLOW') != '1',
                    reason='flagship-shape fixture (~2 GB, minutes); '
                           'HQT_RUN_SLOW=1 to run')
def test_full_lightning_layout_fp16_roundtrip_flagship():
    """Every key of the PUBLISHED L12 layout at real shapes, fp16."""
    cfg = build_twostage_config(FLAGSHIP)
    _roundtrip(cfg, n_sample=2)
