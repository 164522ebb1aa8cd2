"""Attention mask constructors — the six regimes of the reference's
`MultiHeadSelfAttention` (`hqvae/models/stage2/layers.py:104-181`), built as
static numpy bool arrays so they become compile-time constants inside jit.

True = attend, False = blocked (converted to -inf bias by the attention op).
"""

from __future__ import annotations

import numpy as np


def causal(t: int) -> np.ndarray:
    """Standard lower-triangular mask (`layers.py:109-111`)."""
    return np.tril(np.ones((t, t), dtype=bool))


def prefix_causal(t: int, t_ctx: int) -> np.ndarray:
    """Cross-context prefix: queries see the whole prefix, causal among
    themselves (`layers.py:114-117`)."""
    return np.concatenate([np.ones((t, t_ctx), dtype=bool), causal(t)],
                          axis=1)


def decode_causal(t: int, t_past: int) -> np.ndarray:
    """Incremental decode: all past visible, causal among the t new tokens
    (`layers.py:120-123`)."""
    return prefix_causal(t, t_past)


def full(tq: int, tk: int) -> np.ndarray:
    """Bidirectional (`layers.py:143-152` parallel-with-past / ctx cases)."""
    return np.ones((tq, tk), dtype=bool)


def parallel_2level(t: int, parallel_len: int) -> np.ndarray:
    """Depth-transformer mask for 2-level models (`layers.py:130-137`):
    token 0 (sos+h) sees only itself; each group of `parallel_len` bottom
    positions sees everything up to and including its own group."""
    mask = np.zeros((t, t), dtype=bool)
    mask[0, 0] = True
    if t > parallel_len:
        win = parallel_len
        for si in range((t - 1) // win):
            mask[1 + si * win:(si + 1) * win + 1, 0:win * (si + 1) + 1] = True
    return mask


def level3(parallel_type: str) -> np.ndarray:
    """Fixed 21x21 (1+4+16) mask for 3-level models (`layers.py:154-173`).

    'tree'/'quad': each group of 4 bottoms sees itself + its parent mid +
    the top. 'parallel': mids see top+mids, bottoms see everything.
    """
    tm = 1 + 4 + 16
    mask = np.zeros((tm, tm), dtype=bool)
    if parallel_type in ('tree', 'quad'):
        mask[0, 0] = True
        mask[1:1 + 4, 0:1 + 4] = True
        for i in range(4):
            lo, hi = 1 + 4 + 4 * i, 1 + 4 + 4 * (i + 1)
            mask[lo:hi, lo:hi] = True   # bottom group self
            mask[lo:hi, 0] = True       # -> top
            mask[lo:hi, 1 + i] = True   # -> parent mid
    elif parallel_type == 'parallel':
        mask[0, 0] = True
        mask[1:1 + 4, 0:1 + 4] = True
        mask[1 + 4:, 0:tm] = True
    else:
        raise ValueError(parallel_type)
    return mask


def level3_decode(parallel_type: str, t_past: int, t: int) -> np.ndarray:
    """Decode-time slice of the 21x21 mask: rows [t_past, t_past+t), all
    21 columns truncated to t_past+t (`layers.py:175-178`)."""
    m = level3(parallel_type)
    return m[t_past:t_past + t, :t_past + t]
