"""LPIPS parity vs the reference VGG16+lins port
(`hqvae/models/stage1/modules/lpips.py:11-113`).

torchvision is not installed here; the test rebuilds the torchvision
`vgg16().features` Sequential layout in plain torch (identical module
indices), randomizes it, and feeds it to the reference `vgg16` wrapper via
a stub — so the parity claim covers the full weight-mapping + math chain
with random (i.e. adversarial) weights, minus only the external files.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from reference_loader import install_reference, ref_module  # noqa: E402

from hqtransformer_tpu.models.stage1.lpips import (  # noqa: E402
    LPIPS, load_reference_lpips)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _vgg16_features():
    """torchvision vgg16().features layout: conv indices 0,2,5,7,10,12,14,
    17,19,21,24,26,28 with maxpools at 4,9,16,23,30."""
    import torch.nn as tn
    cfg = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
           512, 512, 512, 'M', 512, 512, 512, 'M']
    layers, in_c = [], 3
    for v in cfg:
        if v == 'M':
            layers.append(tn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(tn.Conv2d(in_c, v, kernel_size=3, padding=1))
            layers.append(tn.ReLU(inplace=True))
            in_c = v
    return tn.Sequential(*layers)


@pytest.fixture(scope='module')
def ref_lpips():
    if not os.path.isdir('/root/reference'):
        pytest.skip('reference unavailable')
    install_reference()
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv_models = types.ModuleType('torchvision.models')
        tv.models = tv_models
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tv_models

    class _FakeVGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _vgg16_features()

    sys.modules['torchvision'].models.vgg16 = lambda pretrained=True: \
        _FakeVGG()
    mod = ref_module('hqvae.models.stage1.modules.lpips')
    # the hardcoded private checkpoint path does not exist; random weights
    # are the point of this test
    mod.LPIPS.load_from_pretrained = lambda self, name='vgg_lpips': None
    torch.manual_seed(0)
    m = mod.LPIPS(use_dropout=True).eval()
    # randomize the lin heads (zero-init in some torch versions keeps the
    # test from exercising the head mapping)
    with torch.no_grad():
        for lin in [m.lin0, m.lin1, m.lin2, m.lin3, m.lin4]:
            lin.model[1].weight.uniform_(0.0, 0.2)
    return m


def test_lpips_parity(ref_lpips):
    B, R = 2, 64
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (B, 3, R, R)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        ref = ref_lpips(torch.from_numpy(x), torch.from_numpy(y))
    ref_val = float(ref.mean())

    model = LPIPS()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, R, R, 3)), jnp.zeros((1, R, R, 3)))
    variables = load_reference_lpips(variables, {
        k: v.numpy() for k, v in ref_lpips.state_dict().items()})
    got = float(model.apply(variables,
                            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                            jnp.asarray(np.transpose(y, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, ref_val, rtol=2e-4, atol=2e-6)


def test_lpips_zero_for_identical_inputs(ref_lpips):
    model = LPIPS()
    R = 32
    x = jnp.asarray(np.random.RandomState(1)
                    .uniform(-1, 1, (1, R, R, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    assert float(model.apply(variables, x, x)) == 0.0
