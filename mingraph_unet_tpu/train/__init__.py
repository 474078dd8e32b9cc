"""Training layer: states, checkpointing, trainers, inference entry points."""

from mingraph_unet_tpu.train.checkpoint import CheckpointManager  # noqa: F401
