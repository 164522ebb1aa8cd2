"""On-device logits post-processing: top-k cutoff, nucleus (top-p) filtering,
and categorical sampling.

Semantics mirror the reference exactly (`hqvae/utils/sampling.py:12-37`),
including the >=p shifted-mask convention and the renormalization, but run
fully on-device with static shapes so they live inside jit-compiled
`lax.scan` decode loops instead of the reference's per-step python calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def kth_largest_threshold(logits: jax.Array, k: int,
                          iters: int = 30) -> jax.Array:
    """Per-row threshold t with {x : x >= t} == {x : x >= v_k} (v_k = k-th
    largest), via vectorized bisection.

    Bisection narrows [lo, hi] keeping count(x >= lo) >= k > count(x >= hi);
    after `iters` halvings lo lies in (v_{k+1}, v_k] (or at v_k when tied),
    so thresholding at lo reproduces exact top-k-with-ties filtering. On TPU
    this is ~3x faster than `lax.top_k` at k ~ V/4 (reductions instead of a
    sort network).
    """
    lo = jnp.min(logits, axis=-1)
    hi = jnp.max(logits, axis=-1) + 1e-6

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ge = jnp.sum(logits >= mid[..., None], axis=-1)
        take = ge >= k
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo[..., None]


def cutoff_topk_logits(logits: jax.Array, k: Optional[int],
                       use_bisect: bool = True) -> jax.Array:
    """Keep values >= the k-th largest, set the rest to -inf
    (`sampling.py:12-19`; ties at the threshold survive, like the torch `<`
    comparison). The bisection path computes the same kept set without the
    O(V log V) sort (see kth_largest_threshold)."""
    if k is None:
        return logits
    k = min(k, logits.shape[-1])  # k >= vocab => no-op filter
    if k == logits.shape[-1]:
        return logits
    if use_bisect:
        threshold = kth_largest_threshold(logits, k)
    else:
        threshold = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < threshold, -jnp.inf, logits)


def cutoff_topp_probs(probs: jax.Array, p: Optional[float]) -> jax.Array:
    """Nucleus filtering over probabilities (`sampling.py:22-37`).

    Sort descending, drop tokens once the cumulative mass has reached p —
    shifted by one so the first token above the threshold is kept — then
    renormalize. Implemented with a sort + inverse-permutation gather (static
    shapes, no scatter).
    """
    if p is None:
        return probs
    order = jnp.argsort(-probs, axis=-1, stable=True)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    remove_sorted = cum >= p
    # shift right: always keep the top-1 token (`sampling.py:31-32`)
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
        axis=-1)
    inv = jnp.argsort(order, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    filtered = jnp.where(remove, 0.0, probs)
    return filtered / jnp.sum(filtered, axis=-1, keepdims=True)


def sample_from_logits(key: jax.Array,
                       logits: jax.Array,
                       *,
                       temperature: float = 1.0,
                       top_k: Optional[int] = None,
                       top_p: Optional[float] = None,
                       use_fused: Optional[bool] = None) -> jax.Array:
    """temperature -> top-k -> softmax -> top-p -> categorical draw, the
    sampling pipeline every reference decode loop applies per step
    (e.g. `sampling.py:105-109`, `hierarchical_ar.py:762-785`).

    On TPU with no nucleus filtering the whole pipeline runs as ONE fused
    Pallas kernel (`ops/pallas_sample.py`); `use_fused` overrides the
    auto-detection (fused iff top_p is None and the backend is not CPU).
    """
    if use_fused is None:
        import os
        use_fused = (top_p is None and jax.default_backend() != 'cpu'
                     and os.environ.get('HQT_DISABLE_FUSED_SAMPLE') != '1')
    if use_fused and top_p is None:
        from .pallas_sample import sample_topk_pallas
        return sample_topk_pallas(key, logits, temperature=temperature,
                                  top_k=top_k)
    logits = logits.astype(jnp.float32) / temperature
    logits = cutoff_topk_logits(logits, top_k)
    if top_p is None:
        # categorical is shift-invariant: no softmax/renorm needed
        return jax.random.categorical(key, logits, axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = cutoff_topp_probs(probs, top_p)
    return jax.random.categorical(key, jnp.log(probs + 1e-20), axis=-1)
