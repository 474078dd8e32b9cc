"""Data layer: dataset pairing/loading, batching, and collection tools."""

from mingraph_unet_tpu.data.dataset import MangoDataset, BatchLoader  # noqa: F401
