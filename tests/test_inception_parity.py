"""Numeric parity of the flax FID-InceptionV3 vs the reference port
(`hqvae/utils/inception.py:30-348`) with random weights.

torchvision is not installed; tests/torchvision_inception_stub.py rebuilds
the Inception3 topology in plain torch (attribute names = state_dict keys),
the reference's FID subclasses patch the A/C/E forwards on top of it, and
our converter maps the resulting state_dict onto the flax network — so the
test covers the full evidence chain (pooling quirks, BN stats, resize,
normalization) minus only the external weight file.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from reference_loader import install_reference, ref_module  # noqa: E402
from torchvision_inception_stub import install_torchvision_stub  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hqtransformer_tpu.evaluation.inception import (  # noqa: E402
    FIDInceptionV3, init_fid_inception, load_torch_fid_inception)


@pytest.fixture(scope='module')
def ref_inception():
    if not os.path.isdir('/root/reference'):
        pytest.skip('reference unavailable')
    # other tests (test_eval) may have cached an empty torchvision stub and
    # a half-built hqvae.utils.inception under it — evict both so the real
    # topology stub below is what the reference module binds to
    for name in list(sys.modules):
        if name == 'torchvision' or name.startswith('torchvision.') or \
                name == 'hqvae.utils.inception':
            del sys.modules[name]
    install_torchvision_stub()
    install_reference()
    mod = ref_module('hqvae.utils.inception')

    # neutralize the hardcoded private checkpoint load inside
    # fid_inception_v3 (inception.py:227) — random weights are the point
    real_load, real_lsd = torch.load, torch.nn.Module.load_state_dict
    torch.load = lambda *a, **k: {}
    torch.nn.Module.load_state_dict = lambda self, sd, strict=True: None
    try:
        torch.manual_seed(0)
        fid = mod.fid_inception_v3()
    finally:
        torch.load, torch.nn.Module.load_state_dict = real_load, real_lsd

    # randomize BN running stats + fc so the mapping of every leaf is
    # actually exercised
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in fid.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.2, generator=g)
        fid.fc.weight.normal_(0, 0.02, generator=g)
        fid.fc.bias.zero_()

    mod.fid_inception_v3 = lambda: fid
    wrapper = mod.InceptionV3(output_blocks=[3], resize_input=True,
                              normalize_input=True,
                              use_fid_inception=True).eval()
    return fid, wrapper


def test_fid_inception_parity(ref_inception):
    fid, wrapper = ref_inception
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (2, 3, 75, 75)).astype(np.float32)

    with torch.no_grad():
        outp, logits_t = wrapper(torch.from_numpy(x), return_logits=True)
    ref_feats = outp[0].squeeze(-1).squeeze(-1).numpy()     # [B, 2048]
    ref_logits = logits_t.numpy()

    model, variables = init_fid_inception(jax.random.PRNGKey(0))
    variables = load_torch_fid_inception(
        variables, {k: v.numpy() for k, v in fid.state_dict().items()})
    feats, logits = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        return_logits=True)

    np.testing.assert_allclose(np.asarray(feats), ref_feats,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-3, atol=2e-3)


def test_fid_inception_shapes(ref_inception):
    _, wrapper = ref_inception
    model, variables = init_fid_inception(jax.random.PRNGKey(0))
    feats = model.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert feats.shape == (1, 2048)
