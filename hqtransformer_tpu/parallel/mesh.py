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
    """('dp', 'tp') mesh over all devices. Multi-process aware: when the
    runtime spans several hosts (`jax.process_count() > 1`, the analogue of
    the reference's `--n-nodes`, `main_stage1.py:33-34,104-106`), devices
    are ordered host-major so each 'tp' row stays inside one host's ICI
    domain and the 'dp' all-reduce is hierarchical (ICI within a host, DCN
    across hosts)."""
    if devices is None:
        devices = jax.devices()
    devices = _order_host_major(list(devices))
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f'{dp}x{tp} != {n} devices'
    if tp > 1:
        _check_tp_within_host(devices, tp)
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, ('dp', 'tp'))


def _order_host_major(devices: list) -> list:
    """Sort devices host-major (process_index, then id): the mesh's
    major axis then never straddles a host boundary mid-row. Pure so it is
    unit-testable with stub devices."""
    return sorted(devices, key=lambda d: (getattr(d, 'process_index', 0),
                                          d.id))


def _check_tp_within_host(devices: list, tp: int) -> None:
    """Every contiguous tp-sized row must live on one host: tensor-parallel
    collectives run per layer and must ride ICI, never DCN."""
    for row_start in range(0, len(devices), tp):
        procs = {getattr(d, 'process_index', 0)
                 for d in devices[row_start:row_start + tp]}
        assert len(procs) == 1, (
            f'tp={tp} row at device {row_start} spans hosts {procs}; '
            f'choose tp <= local_device_count '
            f'({len(devices) // max(1, len({getattr(d, "process_index", 0) for d in devices}))})')


def global_batch(mesh: Mesh, x) -> jax.Array:
    """Assemble a dp-sharded GLOBAL batch from this process's host-local
    array. Single-process: equivalent to
    `jax.device_put(x, batch_sharding(mesh))`. Multi-process: each host
    passes only its local slice (global batch = process_count * local
    batch), assembled without any cross-host transfer via
    `jax.make_array_from_process_local_data` — the TPU-native replacement
    for DDP's per-rank DataLoader sharding
    (`/root/reference/main_stage1.py:104-106`)."""
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), np.asarray(x))


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
