"""Explicit halo exchange over the ``spatial`` mesh axis (shard_map + ppermute).

The production spatial-sharding path lets the XLA SPMD partitioner insert
conv halo exchanges automatically (:func:`parallel.spatial.spatial_sharded_apply`).
This module provides the *hand-rolled* equivalent — neighbor exchange of
boundary rows over ICI with ``ppermute`` inside ``shard_map`` — for cases
where explicit control matters (custom overlap schedules, fused
communication, Pallas ring kernels) and as an executable specification of
what the automatic path does. Validated equal to the unsharded computation
in tests on a virtual mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["halo_exchange_rows", "sharded_conv2d_same", "sharded_psconv"]


def halo_exchange_rows(x_local: jnp.ndarray, halo: int, axis_name: str = "spatial") -> jnp.ndarray:
    """Extend a row-sharded NHWC block with ``halo`` rows from each neighbor.

    Inside ``shard_map``: shard i sends its bottom rows to shard i+1 and its
    top rows to shard i-1 (ring ``ppermute`` over ICI); the global top/bottom
    boundaries are zero-filled (matching 'SAME' conv zero padding).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if n == 1:
        zeros = jnp.zeros_like(x_local[:, :halo])
        return jnp.concatenate([zeros, x_local, zeros], axis=1)
    down_perm = [(i, (i + 1) % n) for i in range(n)]
    up_perm = [(i, (i - 1) % n) for i in range(n)]
    # Rows arriving from the previous (upper) shard = its bottom rows.
    from_prev = jax.lax.ppermute(x_local[:, -halo:], axis_name, down_perm)
    # Rows arriving from the next (lower) shard = its top rows.
    from_next = jax.lax.ppermute(x_local[:, :halo], axis_name, up_perm)
    top = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    bottom = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([top, x_local, bottom], axis=1)


def sharded_conv2d_same(
    x: jnp.ndarray, kernel: jnp.ndarray, mesh: Mesh, axis_name: str = "spatial"
) -> jnp.ndarray:
    """'SAME' 2D convolution with the image H axis sharded over ``mesh``.

    ``x`` (B, H, W, C_in) NHWC, ``kernel`` (kh, kw, C_in, C_out); H must be
    divisible by the axis size. Manual halo exchange + local VALID conv.
    """
    kh, kw = kernel.shape[:2]
    halo = kh // 2
    pad_w = kw // 2

    def local_conv(x_local, k):
        xh = halo_exchange_rows(x_local, halo, axis_name)
        xh = jnp.pad(xh, ((0, 0), (0, 0), (pad_w, pad_w), (0, 0)))
        return jax.lax.conv_general_dilated(
            xh, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    fn = shard_map(
        local_conv,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P()),
        out_specs=P(None, axis_name, None, None),
    )
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, axis_name, None, None)))
    with mesh:
        return jax.jit(fn)(x_sh, kernel)


def _batch_axes(mesh: Mesh):
    axes = tuple(a for a in ("dcn", "data") if int(mesh.shape.get(a, 1)) > 1)
    return axes if axes else None


def sharded_psconv(
    x_s2d: jnp.ndarray,
    kmats: jnp.ndarray,
    bias_s2d: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "spatial",
    relu: bool = True,
    interpret: bool = False,
    lane_masks: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Phase-select s2d conv with the s2d H axis sharded (VERDICT r3 #5's
    shard_map half; the batch-dim half is the kernels' own
    custom_partitioning rule).

    Each shard ppermutes ONE s2d boundary row to each neighbor
    (:func:`halo_exchange_rows`, zero-filled at the global borders — the
    kernel's 'SAME' semantics), runs the Pallas kernel on the halo-extended
    block, and keeps the interior rows: extended-output row r reads extended
    rows r−1..r+1, so rows 1..h_local are exactly the unsharded conv. The
    batch dim additionally shards over (dcn, data) with no extra
    communication (the conv is per-image). Validated equal to the unsharded
    kernel on a virtual mesh (tests/test_parallel.py).
    """
    from mingraph_unet_tpu.ops.pallas.psconv import _psel_compute, psconv_lane_masks

    if lane_masks is None:
        lane_masks = psconv_lane_masks(x_s2d.shape[-1] // 4)
    spec = P(_batch_axes(mesh), axis_name, None, None)

    def local(x_local, km, bv, lm):
        xh = halo_exchange_rows(x_local, 1, axis_name)
        # The unpartitioned kernel body (custom_partitioning is for the
        # auto-sharded jit path; inside shard_map the axes are manual).
        y = _psel_compute(xh, km, bv, lm, relu=relu, interpret=interpret)
        return y[:, 1:-1]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P(), P(), P()),
        out_specs=spec,
        # pallas_call's out_shape carries no varying-mesh-axes annotation, so
        # the vma checker cannot see the kernel output varies per shard.
        check_vma=False,
    )
    x_sh = jax.device_put(x_s2d, NamedSharding(mesh, spec))
    with mesh:
        return jax.jit(fn)(x_sh, kmats, bias_s2d, lane_masks)
