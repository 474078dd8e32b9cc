"""Parallelism layer: device meshes, shardings, spatial tiling.

The reference has **no** distributed machinery (SURVEY §2.7). This package is
the TPU-native scale-out story: data parallelism and spatial (H-axis)
sharding over a ``jax.sharding.Mesh``, XLA-inserted collectives over ICI, and
tiled large-scene inference with halo handling.
"""

from mingraph_unet_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
