"""4-connected patch-lattice utilities.

The reference builds the patch graph with a per-image Python double loop over
the grid producing a COO edge list
(``preprocessing/graph_construction/patch_graph_construction.py:49-102``) and
then runs scatter-based GAT/Ncut over it. On TPU the lattice is *structure*,
not data: a node's incoming neighbors are exactly its 4-adjacent grid cells,
so message passing becomes four shifted dense maps plus validity masks —
fully batched, no gather/scatter, and constant-folded by XLA.

Two representations are provided:

- **Grid** ``(..., nph, npw, C)`` with :func:`shift` / :func:`neighbor_stack`:
  the fast path used by the batched pipeline.
- **COO** :func:`lattice_edge_index`: reproduces the reference's exact edge
  ordering for parity tests and for the generic segment-sum code paths.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "DIRECTIONS",
    "lattice_edge_index",
    "shift",
    "neighbor_stack",
    "neighbor_mask",
]

# Incoming-neighbor offsets (dr, dc): the neighbor at (r+dr, c+dc) sends a
# message to (r, c). Order: up, down, left, right.
DIRECTIONS: Tuple[Tuple[int, int], ...] = ((-1, 0), (1, 0), (0, -1), (0, 1))


@lru_cache(maxsize=None)
def lattice_edge_index(nph: int, npw: int) -> np.ndarray:
    """COO (2, E) int32 edge list of the 4-connected lattice.

    Contains both directed edges per neighbor pair, in the same order as the
    reference's loop (right neighbor pair then down neighbor pair, row-major;
    ``patch_graph_construction.py:79-92``). Row 0 = source, row 1 = target.
    """
    edges = []
    for r in range(nph):
        for c in range(npw):
            idx = r * npw + c
            if c + 1 < npw:
                right = r * npw + (c + 1)
                edges.append((idx, right))
                edges.append((right, idx))
            if r + 1 < nph:
                down = (r + 1) * npw + c
                edges.append((idx, down))
                edges.append((down, idx))
    if not edges:
        return np.zeros((2, 0), dtype=np.int32)
    return np.asarray(edges, dtype=np.int32).T.copy()


def shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Shift a grid ``(..., nph, npw, C)`` so position (r, c) holds the value
    from (r+dr, c+dc); out-of-grid entries are zero."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    out = x
    if dr:
        out = jnp.roll(out, -dr, axis=h_axis)
    if dc:
        out = jnp.roll(out, -dc, axis=w_axis)
    return out * neighbor_mask(x.shape[h_axis], x.shape[w_axis], dr, dc, x.dtype)[..., None]


@lru_cache(maxsize=None)
def _mask_np(nph: int, npw: int, dr: int, dc: int) -> np.ndarray:
    m = np.ones((nph, npw), dtype=np.float32)
    if dr == -1:
        m[0, :] = 0
    elif dr == 1:
        m[-1, :] = 0
    if dc == -1:
        m[:, 0] = 0
    elif dc == 1:
        m[:, -1] = 0
    return m


def neighbor_mask(nph: int, npw: int, dr: int, dc: int, dtype=jnp.float32) -> jnp.ndarray:
    """(nph, npw) mask: 1 where a neighbor at offset (dr, dc) exists."""
    return jnp.asarray(_mask_np(nph, npw, dr, dc), dtype=dtype)


def neighbor_stack(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stack the 4 incoming-neighbor views of a grid.

    Args:
        x: ``(..., nph, npw, C)`` node features.

    Returns:
        ``neigh``: ``(..., nph, npw, 4, C)`` — neighbor features per direction
        (zeros where the neighbor is off-grid).
        ``valid``: ``(nph, npw, 4)`` float mask of direction validity.
    """
    nph, npw = x.shape[-3], x.shape[-2]
    views = [shift(x, dr, dc) for dr, dc in DIRECTIONS]
    neigh = jnp.stack(views, axis=-2)
    valid = jnp.stack(
        [neighbor_mask(nph, npw, dr, dc, x.dtype) for dr, dc in DIRECTIONS], axis=-1
    )
    return neigh, valid
