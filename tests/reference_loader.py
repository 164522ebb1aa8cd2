"""Load the PyTorch reference modules from /root/reference in isolation.

The reference package's __init__ files import pytorch_lightning / omegaconf
(not installed here), so we pre-seed sys.modules with empty namespace
packages whose __path__ points at the reference tree, plus an omegaconf stub.
Parity tests then instantiate reference models, export their state_dict, run
our converter, and compare outputs. Used for testing ONLY — no reference code
is imported into the framework itself.
"""

import importlib
import os
import sys
import types

REF = '/root/reference'


class NSDict(dict):
    """dict that also supports attribute access, standing in for OmegaConf
    nodes (reference models do both `**hparams` and `hparams.z_channels`)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _stub_package(name, path=None):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    if path is not None:
        mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


def install_reference():
    if not os.path.isdir(REF):
        return False
    if 'omegaconf' not in sys.modules:
        om = types.ModuleType('omegaconf')
        om.OmegaConf = object
        sys.modules['omegaconf'] = om
    _stub_package('hqvae', os.path.join(REF, 'hqvae'))
    _stub_package('hqvae.models', os.path.join(REF, 'hqvae/models'))
    _stub_package('hqvae.models.stage1', os.path.join(REF, 'hqvae/models/stage1'))
    _stub_package('hqvae.models.stage1.modules',
                  os.path.join(REF, 'hqvae/models/stage1/modules'))
    _stub_package('hqvae.models.stage2', os.path.join(REF, 'hqvae/models/stage2'))
    _stub_package('hqvae.utils', os.path.join(REF, 'hqvae/utils'))
    _stub_package('hqvae.optimizers', os.path.join(REF, 'hqvae/optimizers'))
    return True


def ref_module(dotted):
    """Import e.g. 'hqvae.models.stage1.generator' from the reference tree."""
    assert install_reference(), 'reference tree not available'
    return importlib.import_module(dotted)
