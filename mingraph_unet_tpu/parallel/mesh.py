"""Mesh construction and batch sharding helpers.

Axes:
- ``data``: batch-dimension data parallelism. Gradients all-reduce over ICI
  (``psum`` inserted by the XLA SPMD partitioner — no NCCL-style code).
- ``spatial``: image H-axis sharding for large scenes (the vision analog of
  sequence parallelism). XLA's spatial partitioner inserts conv halo
  exchanges automatically when inputs are annotated along H.

Single-device defaults to a trivial 1×1 mesh so all trainers run unchanged
on one chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_spec"]


def make_mesh(data_parallel: int = 1, spatial_parallel: int = 1, devices=None) -> Mesh:
    """Build a (data, spatial) mesh. ``data_parallel=0`` means 'all devices
    on the data axis'."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if data_parallel == 0:
        data_parallel = len(devs) // max(1, spatial_parallel)
    need = data_parallel * spatial_parallel
    if need > len(devs):
        raise ValueError(
            f"Mesh {data_parallel}x{spatial_parallel} needs {need} devices, "
            f"only {len(devs)} available."
        )
    grid = devs[:need].reshape(data_parallel, spatial_parallel)
    return Mesh(grid, axis_names=("data", "spatial"))


def batch_spec(mesh: Mesh, spatial: bool = False, leading: int = 0) -> P:
    """PartitionSpec for an NHWC (or N...) batch: N over 'data', optionally H
    over 'spatial'. ``leading`` unsharded leading axes (e.g. a scan-window
    axis of stacked batches)."""
    dims = [None] * leading + ["data"]
    if spatial and mesh.shape["spatial"] > 1:
        dims.append("spatial")
    return P(*dims)


def shard_batch(x: jax.Array, mesh: Mesh, spatial: bool = False, leading: int = 0) -> jax.Array:
    """Place a batch array with its mesh sharding (no-op on a 1×1 mesh)."""
    if mesh.shape["data"] == 1 and mesh.shape["spatial"] == 1:
        return x
    spec = batch_spec(mesh, spatial, leading)
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. params) across the mesh."""
    if mesh.shape["data"] == 1 and mesh.shape["spatial"] == 1:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
