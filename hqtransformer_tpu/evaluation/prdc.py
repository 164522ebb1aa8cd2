"""Precision / Recall / Density / Coverage over Inception manifolds.

Mirrors `hqvae/utils/prdc.py:30-155` (itself the prdc package): squared-L2
pairwise distances computed in accelerator-batched tiles (one jitted MXU
matmul per tile instead of the reference's torch bmm), k-NN radii with
argpartition on host, and the four manifold metrics.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _tile_distances(u: jax.Array, v: jax.Array) -> jax.Array:
    """Squared pairwise distances |u|^2 + |v|^2 - 2 u.v (`prdc.py:30-42`)."""
    nu = jnp.sum(u * u, axis=1, keepdims=True)
    nv = jnp.sum(v * v, axis=1, keepdims=True).T
    return nu + nv - 2.0 * jnp.dot(u, v.T,
                                   preferred_element_type=jnp.float32)


def compute_pairwise_distance(data_x: np.ndarray,
                              data_y: Optional[np.ndarray] = None,
                              row_batch_size: int = 10000,
                              col_batch_size: int = 10000) -> np.ndarray:
    """(`prdc.py:45-81`)"""
    if data_y is None:
        data_y = data_x
    n_x, n_y = len(data_x), len(data_y)
    dists = np.zeros([n_x, n_y], dtype=np.float32)
    for b1 in range(0, n_x, row_batch_size):
        e1 = min(b1 + row_batch_size, n_x)
        for b2 in range(0, n_y, col_batch_size):
            e2 = min(b2 + col_batch_size, n_y)
            dists[b1:e1, b2:e2] = np.asarray(_tile_distances(
                jnp.asarray(data_x[b1:e1]), jnp.asarray(data_y[b2:e2])))
    return dists


def get_kth_value(unsorted: np.ndarray, k: int, axis: int = -1) -> np.ndarray:
    """(`prdc.py:84-95`)"""
    indices = np.argpartition(unsorted, k, axis=axis)[..., :k]
    k_smallests = np.take_along_axis(unsorted, indices, axis=axis)
    return k_smallests.max(axis=axis)


def compute_nearest_neighbour_distances(features: np.ndarray,
                                        nearest_k: int) -> np.ndarray:
    """(`prdc.py:98-109`)"""
    distances = compute_pairwise_distance(features)
    return get_kth_value(distances, k=nearest_k + 1, axis=-1)


def compute_prdc(real_features: np.ndarray, fake_features: np.ndarray,
                 nearest_k: int) -> Dict[str, float]:
    """(`prdc.py:112-155`)"""
    real_nnd = compute_nearest_neighbour_distances(real_features, nearest_k)
    fake_nnd = compute_nearest_neighbour_distances(fake_features, nearest_k)
    d_rf = compute_pairwise_distance(real_features, fake_features)

    precision = (d_rf < np.expand_dims(real_nnd, 1)).any(axis=0).mean()
    recall = (d_rf < np.expand_dims(fake_nnd, 0)).any(axis=1).mean()
    density = (1.0 / float(nearest_k)) * \
        (d_rf < np.expand_dims(real_nnd, 1)).sum(axis=0).mean()
    coverage = (d_rf.min(axis=1) < real_nnd).mean()
    return dict(precision=float(precision), recall=float(recall),
                density=float(density), coverage=float(coverage))
