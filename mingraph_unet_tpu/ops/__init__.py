"""Functional, jit-friendly image / patch / lattice / segment ops.

These replace the reference's host-side OpenCV + torchvision preprocessing
(``preprocessing/``) and Python graph-building loops
(``preprocessing/graph_construction/patch_graph_construction.py``) with
shape-static XLA programs.
"""

from mingraph_unet_tpu.ops import cc, filters, image, lattice, patches, segment  # noqa: F401
