"""Evaluation layer: metrics, eval harnesses, ablation study."""

from mingraph_unet_tpu.experiments.metrics import (  # noqa: F401
    calculate_iou,
    object_detection_map,
    segmentation_metrics,
    yield_estimation_metrics,
)
