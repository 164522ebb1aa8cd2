"""Device mesh + sharding rules.

The reference's only parallelism is NCCL data-parallel DDP
(`main_stage1.py:32,104-108`); its in-model collectives are the EMA codebook
all-reduces (`quantizer.py:111-112`). The TPU-native design instead shards
with `jax.sharding` over a 2-D ('dp', 'tp') mesh:

* 'dp' — batch axis: gradients all-reduced by XLA, EMA codebook statistics
  psum'd over the same axis (see `ops/quantize.ema_update`);
* 'tp' — tensor axis: stage-2 attention/MLP weights are Megatron-sharded
  (column-parallel qkv/mlp-in, row-parallel proj/mlp-out), vocabulary
  embeddings and heads sharded over the vocab dim. XLA GSPMD inserts the
  all-reduces on ICI.

The largest reference model (1.4B params) fits on one chip, so 'tp' exists
for scale headroom and is exercised by the multichip dry-run; pipeline /
sequence / expert parallelism are not used — the hierarchy bounds attention
length at 65 tokens and there are no MoE layers (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f'{dp}x{tp} != {n} devices'
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, ('dp', 'tp'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over 'dp'."""
    return NamedSharding(mesh, P('dp'))


# --- stage-2 parameter sharding rules ------------------------------------

def _spec_for_path(path: Tuple[str, ...], shape) -> P:
    """Megatron-style specs keyed on the flax param path."""
    leaf = path[-1]
    parent = path[-2] if len(path) > 1 else ''
    if leaf == 'kernel':
        if parent in ('query', 'key', 'value', 'mlp_0'):
            return P(None, 'tp')        # column parallel
        if parent in ('proj', 'mlp_2'):
            return P('tp', None)        # row parallel
        if parent.startswith('head'):
            return P(None, 'tp')        # vocab-sharded output head
        return P()
    if leaf == 'bias':
        if parent in ('query', 'key', 'value', 'mlp_0'):
            return P('tp')
        return P()
    if leaf == 'embedding':
        if parent.startswith('tok_emb'):
            return P(None, 'tp')        # feature-sharded token tables
        return P()
    if leaf == 'scale':
        return P()
    return P()


def stage2_param_sharding(mesh: Mesh, params) -> dict:
    """Map a stage-2 params tree to NamedShardings per the rules above."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_tuple(kp):
        out = []
        for e in kp:
            if hasattr(e, 'key'):
                out.append(str(e.key))
            else:
                out.append(str(e))
        return tuple(out)

    specs = {}
    for kp, leaf in flat:
        specs[path_tuple(kp)] = NamedSharding(
            mesh, _spec_for_path(path_tuple(kp), leaf.shape))

    def build(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (k,)) for k, v in tree.items()}
        return specs[prefix]

    return build(params)
