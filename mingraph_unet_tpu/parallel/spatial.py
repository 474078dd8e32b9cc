"""Large-scene spatial scaling: tiled inference with halo overlap, and
mesh-sharded whole-scene execution.

The reference has no large-scene story (its pipeline is fixed 128² tiles).
This module covers BASELINE.json configs 4-5: 1024²+ aerial/farmland scenes
— the vision analog of sequence parallelism (SURVEY §5 "long-context" row).

Two strategies:

1. :func:`tiled_inference` — single-chip: pad the scene, cut overlapping
   ``tile + 2·halo`` windows (static count), run the network batched over
   tiles, crop halos, stitch. The halo absorbs the U-Net's receptive-field
   edge effects so stitched logits match whole-scene inference away from
   numerically-degenerate pixels.
2. :func:`spatial_sharded_apply` — multi-chip: annotate the scene H-axis over
   the mesh's ``spatial`` axis and run the *whole* scene; the XLA SPMD
   partitioner inserts conv halo exchanges over ICI automatically.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["extract_tiles", "stitch_tiles", "tiled_inference", "spatial_sharded_apply"]


def _grid(size: int, tile: int) -> int:
    return -(-size // tile)


def _tile_starts(size: int, tile: int, halo: int) -> list:
    """Clamped window starts: interior windows carry a real-data halo; border
    windows sit flush with the scene edge so the network's own zero padding
    applies at the *true* border (zero-filled halos would otherwise pick up
    bias/ReLU offsets layer-by-layer and diverge from whole-scene outputs)."""
    win = tile + 2 * halo
    n_tiles = _grid(size, tile)
    starts = []
    for t in range(n_tiles):
        starts.append(max(0, min(t * tile - halo, size - win)))
    return starts


def extract_tiles(scene: jnp.ndarray, tile: int, halo: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """NHWC scene → (N·nty·ntx, win, win, C) overlapping windows with
    clamped (border-flush) placement; ``win = tile + 2·halo``.

    Requires scene H, W ≥ ``tile + 2·halo`` (use the network directly for
    smaller scenes) and, for pooling networks, H, W, tile and halo all
    multiples of the total downsampling factor.
    """
    n, h, w, c = scene.shape
    win = tile + 2 * halo
    if h < win or w < win:
        raise ValueError(f"Scene {h}x{w} smaller than window {win}; run un-tiled instead.")
    ys = _tile_starts(h, tile, halo)
    xs = _tile_starts(w, tile, halo)
    tiles = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(jax.lax.dynamic_slice(scene, (0, y0, x0, 0), (n, win, win, c)))
    stacked = jnp.stack(tiles, axis=0)  # (T, N, win, win, C), tile-major
    return stacked.reshape(len(ys) * len(xs) * n, win, win, c), (len(ys), len(xs))


def stitch_tiles(
    tile_outputs: jnp.ndarray,
    grid: Tuple[int, int],
    batch: int,
    scene_hw: Tuple[int, int],
    tile: int,
    halo: int,
) -> jnp.ndarray:
    """Inverse of :func:`extract_tiles` for per-pixel outputs: crop each
    window back to its ``tile``-sized cell (accounting for border-clamped
    placement), lay cells out, trim to the scene."""
    nty, ntx = grid
    h, w = scene_hw
    ys = _tile_starts(h, tile, halo)
    xs = _tile_starts(w, tile, halo)
    t_out = tile_outputs.reshape(nty, ntx, batch, *tile_outputs.shape[1:])
    rows = []
    for ty in range(nty):
        cols = []
        for tx in range(ntx):
            oy = ty * tile - ys[ty]  # offset of this cell inside its window
            ox = tx * tile - xs[tx]
            cols.append(t_out[ty, tx, :, oy : oy + tile, ox : ox + tile, :])
        rows.append(jnp.concatenate(cols, axis=2))
    full = jnp.concatenate(rows, axis=1)
    return full[:, :h, :w, :]


def tiled_inference(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    scene: jnp.ndarray,
    tile: int = 512,
    halo: int = 32,
    tile_batch: Optional[int] = None,
) -> jnp.ndarray:
    """Run ``apply_fn`` (NHWC → NHWC per-pixel outputs, e.g. U-Net logits)
    over a large scene by overlapping tiles.

    ``tile_batch`` caps how many tiles run per network call (memory control);
    default all at once. Fully jittable for static scene shapes.

    Exactness: choose ``halo`` ≥ the network's half receptive field AND a
    multiple of its total downsampling factor (2^depth for the U-Net) so
    pooling grids align across tiles — then stitched outputs equal
    whole-scene outputs to float tolerance.
    """
    n, h, w, _ = scene.shape
    tiles, grid = extract_tiles(scene, tile, halo)
    total = tiles.shape[0]
    if tile_batch is None or tile_batch >= total:
        outs = apply_fn(tiles)
    else:
        chunks = []
        for start in range(0, total, tile_batch):
            chunks.append(apply_fn(tiles[start : start + tile_batch]))
        outs = jnp.concatenate(chunks, axis=0)
    return stitch_tiles(outs, grid, n, (h, w), tile, halo)


def spatial_sharded_apply(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    scene: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """Whole-scene inference with the H axis sharded over ``mesh``'s
    ``spatial`` axis (and batch over ``data``): XLA inserts the halo
    exchanges for convolutions over ICI."""
    sharding = NamedSharding(mesh, P("data", "spatial"))
    scene_sh = jax.device_put(scene, sharding)
    with mesh:
        out = jax.jit(apply_fn, in_shardings=sharding, out_shardings=sharding)(scene_sh)
    return out
