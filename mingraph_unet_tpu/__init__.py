"""MinGraph-UNet TPU: a TPU-native (JAX/XLA/Pallas) graph-augmented U-Net framework.

A from-scratch re-design of the capabilities of the MinGraph-UNet reference
(mango segmentation / detection / yield estimation from orchard imagery):

- Preprocessing (resize / normalize / synced augmentation / Sobel / histogram
  equalization / Gaussian smoothing) as fused ``jax.jit`` transforms
  (:mod:`mingraph_unet_tpu.ops`).
- U-Net encoder/decoder (NHWC, bf16-capable) in Flax
  (:mod:`mingraph_unet_tpu.models.unet`).
- Patch-lattice GAT message passing expressed as dense shifted-neighbor ops and
  rank-1 attention matmuls on the MXU -- no irregular gather/scatter
  (:mod:`mingraph_unet_tpu.models.gat`).
- Differentiable Normalized-Cut partitioning, region pooling + region GAT,
  feature fusion, and detection head, all shape-static and batched
  (:mod:`mingraph_unet_tpu.models`).
- Data-parallel + spatially-sharded execution over a ``jax.sharding.Mesh``
  (:mod:`mingraph_unet_tpu.parallel`).
- Orbax checkpoint/resume, structured metrics logging, profiling hooks.

The reference implementation this framework re-imagines lives at
``/root/reference/MinGraph-UNet`` (PyTorch/OpenCV, single device). Citations in
docstrings use ``file:line`` relative to that tree.
"""

__version__ = "0.1.0"
