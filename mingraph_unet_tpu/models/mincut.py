"""Differentiable Normalized-Cut partitioning (L_partition).

TPU-native re-design of ``model/graph_partition/mincut_refinement.py``: the
reference computes Gaussian edge weights ``w_ij = exp(-‖f_i − f_j‖²/2σ²)``
over a COO edge list (``mincut_refinement.py:30-52``) and loops over K
segments with scatter_add degrees (lines 83-152). Here both directions are
dense:

- **lattice backend**: weights over the 4 shifted-neighbor maps, degree =
  direction-sum, cut/assoc via broadcast multiplies — O(4N·K), batched.
- **dense backend**: full (N, N) masked weight matrix; cut/assoc reduce to
  two MXU matmuls (``W @ P`` and inner products) — exact for arbitrary
  graphs, used for the region graph and parity tests.

Exact reference semantics preserved: per-segment contribution ``cut_k /
assoc_k`` is added **only when** ``assoc_k > 1e-8`` (line 151); degrees count
*outgoing* edge weights (line 96), which on the symmetric lattice equals the
direction-sum; σ for the Gaussian kernel defaults to the reference's
hard-coded 1.0 (line 50).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mingraph_unet_tpu.models.gat import GATNetwork
from mingraph_unet_tpu.ops import lattice as lattice_ops

__all__ = [
    "edge_weights_dense",
    "normalized_cut_loss_dense",
    "normalized_cut_loss_lattice",
    "SegmentPredictor",
    "MinCutRefinement",
]

_ASSOC_EPS = 1e-8


def edge_weights_dense(node_features: jnp.ndarray, adj: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Masked Gaussian similarity matrix ``W[i, j] = adj[i, j]·exp(-‖f_i −
    f_j‖²/2σ²)`` (``mincut_refinement.py:30-52``). ``node_features``
    (..., N, D); ``adj`` is 0/1 (N, N) or batched (..., N, N)."""
    sq = jnp.sum(node_features**2, axis=-1)
    gram = jnp.einsum("...nd,...md->...nm", node_features, node_features)
    dist_sq = sq[..., :, None] + sq[..., None, :] - 2.0 * gram
    dist_sq = jnp.maximum(dist_sq, 0.0)
    w = jnp.exp(-dist_sq / (2.0 * sigma**2))
    return w * adj


def normalized_cut_loss_dense(
    node_features: jnp.ndarray,
    adj: jnp.ndarray,
    soft_assignments: jnp.ndarray,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """L_partition = Σ_k cut(A_k, V∖A_k) / assoc(A_k, V) on a dense graph.

    ``soft_assignments`` (..., N, K). Directed-edge semantics: for every
    adjacency entry (i→j), ``cut += w_ij·P_ik·(1 − P_jk)`` and ``deg_i +=
    w_ij`` (reference lines 96, 149).
    """
    w = edge_weights_dense(node_features, adj, sigma)
    p = soft_assignments
    deg = w.sum(axis=-1)  # (..., N) outgoing degree
    assoc = jnp.einsum("...nk,...n->...k", p, deg)
    wp = jnp.einsum("...nm,...mk->...nk", w, p)  # Σ_j w_ij P_jk
    cut = assoc - jnp.einsum("...nk,...nk->...k", p, wp)
    safe = jnp.where(assoc > _ASSOC_EPS, assoc, 1.0)
    per_k = jnp.where(assoc > _ASSOC_EPS, cut / safe, 0.0)
    return per_k.sum(axis=-1)


def normalized_cut_loss_lattice(
    features: jnp.ndarray,
    soft_assignments: jnp.ndarray,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Same loss on the implicit 4-connected lattice, O(4N·K).

    ``features`` (..., nph, npw, D); ``soft_assignments`` (..., nph, npw, K).
    Returns a scalar per leading batch index (or scalar if unbatched).
    """
    nph, npw = features.shape[-3], features.shape[-2]
    w_dirs = []
    p_neighbors = []
    for dr, dc in lattice_ops.DIRECTIONS:
        f_n = lattice_ops.shift(features, dr, dc)
        valid = lattice_ops.neighbor_mask(nph, npw, dr, dc, features.dtype)
        dist_sq = jnp.sum((features - f_n) ** 2, axis=-1)
        w = jnp.exp(-dist_sq / (2.0 * sigma**2)) * valid
        w_dirs.append(w)
        p_neighbors.append(lattice_ops.shift(soft_assignments, dr, dc))
    w_stack = jnp.stack(w_dirs, axis=-1)  # (..., nph, npw, 4)
    pn_stack = jnp.stack(p_neighbors, axis=-2)  # (..., nph, npw, 4, K)
    deg = w_stack.sum(axis=-1)  # (..., nph, npw)
    p = soft_assignments
    assoc = jnp.einsum("...rck,...rc->...k", p, deg)
    # cut_k = Σ_i Σ_d w_d(i)·P_ik·(1 − P_{nbr_d(i),k})
    cut = jnp.einsum("...rck,...rcd->...k", p, w_stack) - jnp.einsum(
        "...rck,...rcd,...rcdk->...k", p, w_stack, pn_stack
    )
    safe = jnp.where(assoc > _ASSOC_EPS, assoc, 1.0)
    per_k = jnp.where(assoc > _ASSOC_EPS, cut / safe, 0.0)
    return per_k.sum(axis=-1)


class SegmentPredictor(nn.Module):
    """Per-node K-way segment logits head (reference ``PatchSegmentPredictor``
    at ``scripts/train_end_to_end.py:40-70``): GNN (1-layer GAT) or MLP."""

    num_segments: int
    hidden_dim: Optional[int] = None
    use_gnn: bool = True
    num_gnn_layers: int = 1
    num_heads: int = 1
    dropout_rate: float = 0.1
    alpha: float = 0.2
    backend: str = "lattice"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        adj: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.use_gnn:
            return GATNetwork(
                hidden_dim=self.hidden_dim or x.shape[-1],
                output_dim=self.num_segments,
                num_heads=self.num_heads,
                num_layers=self.num_gnn_layers,
                dropout_rate=self.dropout_rate,
                alpha=self.alpha,
                backend=self.backend,
                dtype=self.dtype,
                name="gnn_predictor",
            )(x, adj=adj, deterministic=deterministic)
        hidden = self.hidden_dim or 2 * x.shape[-1]
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return nn.Dense(self.num_segments, dtype=self.dtype, name="fc2")(h)


class MinCutRefinement(nn.Module):
    """Predict soft segment assignments and compute L_partition.

    ``__call__`` returns ``(l_partition, soft_assignments)`` like the
    reference ``MinCutRefinement.forward`` (``mincut_refinement.py:163-205``),
    softmax over segment logits included (line 193). The ``gamma/sigma``
    energy-function parameters of the reference ctor are accepted for config
    parity but unused there too (lines 6-27).
    """

    num_segments: int
    sigma_ncut: float = 1.0
    backend: str = "lattice"
    predictor_hidden: Optional[int] = None
    predictor_use_gnn: bool = True
    predictor_heads: int = 1
    dropout_rate: float = 0.1
    alpha: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        gat_features: jnp.ndarray,
        adj: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = SegmentPredictor(
            num_segments=self.num_segments,
            hidden_dim=self.predictor_hidden,
            use_gnn=self.predictor_use_gnn,
            num_heads=self.predictor_heads,
            dropout_rate=self.dropout_rate,
            alpha=self.alpha,
            backend=self.backend,
            dtype=self.dtype,
            name="segment_predictor",
        )(gat_features, adj=adj, deterministic=deterministic)
        soft = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if self.backend == "lattice":
            loss = normalized_cut_loss_lattice(
                gat_features.astype(jnp.float32), soft, self.sigma_ncut
            )
        else:
            if adj is None:
                raise ValueError("dense backend requires adjacency")
            loss = normalized_cut_loss_dense(
                gat_features.astype(jnp.float32), adj, soft, self.sigma_ncut
            )
        return loss, soft
