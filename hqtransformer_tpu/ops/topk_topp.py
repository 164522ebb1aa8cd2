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


def cutoff_topk_logits(logits: jax.Array, k: Optional[int]) -> jax.Array:
    """Keep values >= the k-th largest, set the rest to -inf
    (`sampling.py:12-19`; ties at the threshold survive, like the torch `<`
    comparison)."""
    if k is None:
        return logits
    k = min(k, logits.shape[-1])  # k >= vocab => no-op filter
    v = jax.lax.top_k(logits, k)[0]
    threshold = v[..., -1:]
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
                       top_p: Optional[float] = None) -> jax.Array:
    """temperature -> top-k -> softmax -> top-p -> categorical draw, the
    sampling pipeline every reference decode loop applies per step
    (e.g. `sampling.py:105-109`, `hierarchical_ar.py:762-785`)."""
    logits = logits.astype(jnp.float32) / temperature
    logits = cutoff_topk_logits(logits, top_k)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = cutoff_topp_probs(probs, top_p)
    return jax.random.categorical(key, jnp.log(probs + 1e-20), axis=-1)
