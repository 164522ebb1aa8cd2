"""Checkpoint I/O: Orbax for native checkpoints plus a torch-state_dict
converter for the reference's released weights.

The reference stores everything in Lightning ckpts under `state_dict` with
layouts documented in SURVEY.md §5 (`vqgan.py:139-145`,
`generator.py:389-395`, `hierarchical_ar.py:880-886`). The converter maps
those dotted torch names onto this framework's flax param/collection paths
and transposes tensors between torch (OIHW / [out,in] linear) and flax
(HWIO / [in,out]) layouts. Shape checking is strict: every torch tensor must
land on an identically-sized flax leaf.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torch name -> flax path
# ---------------------------------------------------------------------------

_LIST_PATTERNS = [
    # encoder/decoder inner structure (`modules/layers.py:222-245,353-375`)
    (re.compile(r'^(down|up)\.(\d+)\.(block|attn)\.(\d+)\.'),
     lambda m: f'{m.group(1)}_{m.group(2)}_{m.group(3)}_{m.group(4)}.'),
    (re.compile(r'^(down|up)\.(\d+)\.(downsample|upsample)\.'),
     lambda m: f'{m.group(1)}_{m.group(2)}_{m.group(3)}.'),
    (re.compile(r'^mid\.(block_1|attn_1|block_2)\.'),
     lambda m: f'mid_{m.group(1)}.'),
    # N-level generator ModuleLists (`generator.py:502-504`)
    (re.compile(r'^(downsamples|upsamples|quantizers)\.(\d+)\.'),
     lambda m: f'{m.group(1)}_{m.group(2)}.'),
    # VQGAN2 nearest upsample Sequential (`generator.py:125-128`)
    (re.compile(r'^upsample_t\.0\.'), lambda m: 'upsample_t_0.'),
    # discriminator Sequential (`modules/layers.py:439-461`)
    (re.compile(r'^main\.(\d+)\.'), lambda m: f'main_{m.group(1)}.'),
    # stage-2 block lists / mlp Sequential / multi-level ModuleLists
    (re.compile(r'^(blocks|depths|emb_blocks)\.(\d+)\.'),
     lambda m: f'{m.group(1)}_{m.group(2)}.'),
    (re.compile(r'^mlp\.(\d+)\.'), lambda m: f'mlp_{m.group(1)}.'),
    (re.compile(r'^(tok_emb_levels|tok_emb_depth_levels|pos_emb_depths|'
                r'ln_levels|head_levels)\.(\d+)\.'),
     lambda m: f'{m.group(1)}_{m.group(2)}.'),
]


def _translate_name(tkey: str) -> str:
    """Apply list-index renames anywhere in a dotted torch key."""
    parts = tkey.split('.')
    # run patterns repeatedly on the tail until stable
    out = tkey
    changed = True
    while changed:
        changed = False
        for pat, repl in _LIST_PATTERNS:
            # allow match at any segment boundary
            for i in range(len(out.split('.'))):
                prefix = '.'.join(out.split('.')[:i])
                tail = '.'.join(out.split('.')[i:]) + '.'
                m = pat.match(tail)
                if m:
                    new_tail = pat.sub(repl(m), tail, count=1)
                    out = (prefix + '.' if prefix else '') + new_tail[:-1]
                    changed = True
                    break
            if changed:
                break
    return out


_EMA_BUFFERS = ('embedding', 'cluster_size', 'embedding_avg')
_NORM_PARENTS = ('norm', 'norm1', 'norm2', 'norm_out', 'ln1', 'ln2', 'ln3',
                 'ln_f', 'ln_top', 'ln_bot', 'ln_txt')


def torch_key_to_path(tkey: str) -> Tuple[str, Tuple[str, ...]]:
    """Returns (collection, flax path tuple) for one torch state_dict key."""
    name = _translate_name(tkey)
    parts = name.split('.')

    # EMA quantizer buffers: quantize_t.embedding etc. (no .weight suffix)
    if parts[-1] in _EMA_BUFFERS and 'quantize' in parts[-2]:
        return 'ema', tuple(parts)

    if parts[-1] == 'weight':
        parent = parts[-2]
        if parent in _NORM_PARENTS or parent.startswith('ln_levels') \
           or (parent.startswith('main_') and _is_norm_main(parts)):
            return 'params', tuple(parts[:-1] + ['scale'])
        # VectorQuantizer's nn.Embedding: quantize*.embedding.weight -> the
        # flax param is itself called 'embedding' (`quantizer.py:25-26`)
        if parent == 'embedding':
            return 'params', tuple(parts[:-1])
        # torch nn.Embedding -> flax nn.Embed param 'embedding'
        if parent.startswith(('tok_emb', 'pos_emb', 'sos', 'pred_emb')):
            return 'params', tuple(parts[:-1] + ['embedding'])
        return 'params', tuple(parts[:-1] + ['kernel'])

    if parts[-1] == 'bias':
        return 'params', tuple(parts)

    # bare nn.Parameter (sos, sos_depth, pos_emb_bot, actnorm loc/scale)
    return 'params', tuple(parts)


def _is_norm_main(parts) -> bool:
    """Discriminator `main_{i}` entries alternate conv / norm; norm layers
    have 1-D weight which the caller disambiguates by shape — this helper is
    only used for name-based routing and errs on 'conv'; shape-based fixup
    happens in convert()."""
    return False


# ---------------------------------------------------------------------------
# tensor layout conversion
# ---------------------------------------------------------------------------

def _fit_tensor(src: np.ndarray, dst_shape: Tuple[int, ...],
                tkey: str, leaf: str) -> np.ndarray:
    """Transpose/reshape a torch tensor into the flax leaf's layout.

    The transform is keyed on the flax leaf name, NOT on shapes — a square
    Linear weight still needs its [out,in] -> [in,out] transpose.
    """
    s = tuple(src.shape)
    d = tuple(dst_shape)
    if leaf == 'kernel':
        if src.ndim == 2:
            out = np.transpose(src)          # Linear [out,in] -> [in,out]
        elif src.ndim == 4:
            hwio = np.transpose(src, (2, 3, 1, 0))   # conv OIHW -> HWIO
            if tuple(hwio.shape) == d:
                out = hwio
            elif s == d:
                out = src                    # ConvTransposeUp torch layout
            else:
                raise ValueError(f'cannot fit {tkey}: torch {s} -> flax {d}')
        else:
            raise ValueError(f'cannot fit {tkey}: torch {s} -> flax {d}')
    else:
        out = src
    if tuple(out.shape) != d:
        raise ValueError(f'cannot fit {tkey}: torch {s} -> flax {d} '
                         f'(leaf {leaf})')
    return out


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        path = prefix + (k,)
        if isinstance(v, Mapping):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def convert_torch_state_dict(state_dict: Mapping[str, np.ndarray],
                             variables: Mapping[str, Any],
                             strip_prefix: str = '',
                             strict: bool = True) -> Dict[str, Any]:
    """Map a torch state_dict onto a flax variables dict of the same model.

    `variables` is the template from `module.init(...)` (collections
    'params', optionally 'ema', 'batch_stats'). `strip_prefix` removes e.g.
    'generator.' (the reference strips 10 chars in `from_ckpt`,
    `generator.py:389-395`).
    """
    flat_by_col = {col: _flatten(tree) for col, tree in variables.items()}
    # string-keyed lookup per collection
    lookup = {col: {'.'.join(p): (p, np.asarray(v))
                    for p, v in flat.items()}
              for col, flat in flat_by_col.items()}
    new_flat = {col: dict(flat) for col, flat in flat_by_col.items()}

    unmatched = []
    matched_paths = set()
    for tkey, tval in state_dict.items():
        if strip_prefix and tkey.startswith(strip_prefix):
            tkey = tkey[len(strip_prefix):]
        tval = np.asarray(tval, dtype=np.float32)
        col, path = torch_key_to_path(tkey)
        pstr = '.'.join(path)
        # shape-based fixups for ambiguous names
        if col == 'params' and pstr not in lookup['params']:
            alts = []
            if path[-1] == 'kernel':
                alts.append(path[:-1] + ('scale',))  # 1-D norm weight
                alts.append(path[:-1] + ('embedding',))
            if path[-1] == 'scale':
                alts.append(path[:-1] + ('kernel',))
            for alt in alts:
                if '.'.join(alt) in lookup['params']:
                    path, pstr = alt, '.'.join(alt)
                    break
        if col == 'params' and pstr not in lookup['params'] \
                and 'batch_stats' in lookup:
            # BatchNorm running stats route to batch_stats
            bs_path = None
            if path[-1] in ('running_mean', 'running_var'):
                tail = 'mean' if path[-1] == 'running_mean' else 'var'
                bs_path = path[:-1] + (tail,)
            if bs_path and '.'.join(bs_path) in lookup['batch_stats']:
                col, path, pstr = 'batch_stats', bs_path, '.'.join(bs_path)
        if tkey.endswith('num_batches_tracked'):
            continue
        if col not in lookup or pstr not in lookup[col]:
            unmatched.append(tkey)
            continue
        target_path, target = lookup[col][pstr]
        fitted = _fit_tensor(tval, target.shape, tkey, path[-1])
        new_flat[col][target_path] = jnp.asarray(fitted)
        matched_paths.add((col, target_path))

    if strict:
        if unmatched:
            raise KeyError(f'unmatched torch keys: {unmatched[:10]}'
                           f' (+{max(0, len(unmatched) - 10)} more)')
        missing = [(c, p) for c, flat in flat_by_col.items()
                   for p in flat if (c, p) not in matched_paths]
        if missing:
            raise KeyError(f'flax leaves not covered: {missing[:10]}'
                           f' (+{max(0, len(missing) - 10)} more)')
    return {col: _unflatten(flat) for col, flat in new_flat.items()}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a Lightning/torch .ckpt and return the numpy state_dict."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    return {k: v.detach().numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, tree: Any, step: int = 0) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, str(step)), tree, force=True)


def restore_checkpoint(path: str, step: int = 0, template: Any = None) -> Any:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.join(path, str(step)), item=template)
    return ckptr.restore(os.path.join(path, str(step)))


def latest_step(path: str) -> int:
    """Largest numeric step directory under an orbax checkpoint dir (the
    layout save_checkpoint writes: <path>/<step>/...). Raises FileNotFoundError
    with both accepted layouts named when none exists — shared by every
    restore-latest call site (training --resume, --stage1-ckpt, eval,
    sampling)."""
    steps = [int(p) for p in os.listdir(path) if p.isdigit()]
    if not steps:
        raise FileNotFoundError(
            f'no checkpoint steps under {path} (expected numeric step '
            f'subdirectories as written by save_checkpoint; pass the '
            f'ckpt/ dir itself, not the run dir)')
    return max(steps)


# ---------------------------------------------------------------------------
# flax -> torch export (round-trip inverse of convert_torch_state_dict)
# ---------------------------------------------------------------------------

_INV_PATTERNS = [
    (re.compile(r'^(down|up)_(\d+)_(block|attn)_(\d+)$'),
     lambda m: f'{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}'),
    (re.compile(r'^(down|up)_(\d+)_(downsample|upsample)$'),
     lambda m: f'{m.group(1)}.{m.group(2)}.{m.group(3)}'),
    (re.compile(r'^mid_(block_1|attn_1|block_2)$'),
     lambda m: f'mid.{m.group(1)}'),
    (re.compile(r'^(downsamples|upsamples|quantizers|blocks|depths|'
                r'emb_blocks|tok_emb_levels|tok_emb_depth_levels|'
                r'pos_emb_depths|ln_levels|head_levels)_(\d+)$'),
     lambda m: f'{m.group(1)}.{m.group(2)}'),
    (re.compile(r'^upsample_t_0$'), lambda m: 'upsample_t.0'),
    (re.compile(r'^main_(\d+)$'), lambda m: f'main.{m.group(1)}'),
    (re.compile(r'^mlp_(\d+)$'), lambda m: f'mlp.{m.group(1)}'),
]


def _untranslate_segment(seg: str) -> str:
    for pat, repl in _INV_PATTERNS:
        m = pat.match(seg)
        if m:
            return repl(m)
    return seg


def export_torch_state_dict(variables: Mapping[str, Any],
                            prefix: str = '') -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: emit a torch-layout state_dict
    (numpy arrays) from flax variables, so checkpoints trained here can be
    loaded by the PyTorch reference."""
    out: Dict[str, np.ndarray] = {}
    for col, tree in variables.items():
        for path, leaf in _flatten(tree).items():
            arr = np.asarray(jax.device_get(leaf), np.float32)
            segs = [_untranslate_segment(s) for s in path[:-1]]
            leaf_name = path[-1]
            base = '.'.join(segs)

            def key(tail):
                return f'{prefix}{base}.{tail}' if base else \
                    f'{prefix}{tail}'
            if col == 'ema':
                out[key(leaf_name)] = arr
                continue
            if col == 'batch_stats':
                tail = 'running_mean' if leaf_name == 'mean' else \
                    'running_var'
                out[key(tail)] = arr
                continue
            if leaf_name == 'kernel':
                if arr.ndim == 4:
                    # ConvTransposeUp keeps torch layout [Cin, Cout, k, k];
                    # detect by name (upsample_t / upsamples.N with 4D kernel)
                    seg_last = segs[-1] if segs else ''
                    if seg_last.startswith('upsample') and \
                            'upsample_t.0' not in seg_last:
                        out[key('weight')] = arr
                    else:
                        out[key('weight')] = np.transpose(arr, (3, 2, 0, 1))
                else:
                    out[key('weight')] = np.transpose(arr)
            elif leaf_name == 'scale':
                out[key('weight')] = arr
            elif leaf_name == 'embedding':
                if segs and segs[-1].split('.')[-1].startswith('quantize'):
                    # VectorQuantizer's nn.Embedding submodule
                    out[key('embedding.weight')] = arr
                else:
                    out[key('weight')] = arr
            else:
                out[key(leaf_name)] = arr
    return out
