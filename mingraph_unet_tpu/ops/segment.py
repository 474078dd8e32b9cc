"""Segment / region pooling primitives as one-hot matmuls on the MXU.

The reference's region stage aggregates GAT patch features per hard segment
label with a Python loop over segments (``scripts/train_end_to_end.py:368-373``)
and broadcasts region embeddings back with advanced indexing (line 422). Here
both directions are ``one_hot`` matmuls — dense, batched, MXU-friendly — per
the BASELINE north star ("dense padded-adjacency ops / one-hot matmul … to
avoid irregular gather/scatter").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "segment_mean",
    "segment_sum_matmul",
    "gather_rows",
    "bincount_fixed",
]


def segment_sum_matmul(values: jnp.ndarray, labels: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum ``values (..., N, D)`` into ``num_segments`` buckets keyed by
    ``labels (..., N)`` via a one-hot matmul. Returns ``(..., K, D)``."""
    onehot = jax.nn.one_hot(labels, num_segments, dtype=values.dtype)  # (..., N, K)
    return jnp.einsum("...nk,...nd->...kd", onehot, values, precision=jax.lax.Precision.HIGHEST)


def segment_mean(
    values: jnp.ndarray, labels: jnp.ndarray, num_segments: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-segment mean with empty segments mapped to zeros.

    Matches the reference's region pooling: ``mean`` of member features if a
    segment is non-empty, else the zero vector
    (``scripts/train_end_to_end.py:368-373``).

    Returns ``(means (..., K, D), counts (..., K))``.
    """
    onehot = jax.nn.one_hot(labels, num_segments, dtype=values.dtype)
    sums = jnp.einsum("...nk,...nd->...kd", onehot, values, precision=jax.lax.Precision.HIGHEST)
    counts = onehot.sum(axis=-2)
    means = sums / jnp.maximum(counts, 1.0)[..., None]
    return means, counts


def gather_rows(table: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Broadcast ``table (..., K, D)`` rows to ``labels (..., N)`` positions
    via one-hot matmul: returns ``(..., N, D)``.

    Dense equivalent of ``table[labels]``
    (``scripts/train_end_to_end.py:422``), negative labels yield zeros.
    """
    k = table.shape[-2]
    onehot = jax.nn.one_hot(labels, k, dtype=table.dtype)  # (..., N, K); -1 → all-zero row
    return jnp.einsum("...nk,...kd->...nd", onehot, table, precision=jax.lax.Precision.HIGHEST)


def bincount_fixed(labels: jnp.ndarray, num_bins: int, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Shape-static bincount over the last axis."""
    onehot = jax.nn.one_hot(labels, num_bins, dtype=jnp.float32 if weights is None else weights.dtype)
    if weights is None:
        return onehot.sum(axis=-2)
    return jnp.einsum("...nk,...n->...k", onehot, weights, precision=jax.lax.Precision.HIGHEST)
