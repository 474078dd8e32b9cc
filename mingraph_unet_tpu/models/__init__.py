"""Model zoo: U-Net, GAT stacks, MinCut partitioning, fusion, detection.

All modules are Flax Linen, NHWC layout, with a ``dtype`` knob for bf16
compute (fp32 parameters). Shapes are fully static so every forward compiles
to a single fused XLA program.
"""

from mingraph_unet_tpu.models.unet import ConvBlock, UNet, UNetDecoder, UNetEncoder  # noqa: F401
from mingraph_unet_tpu.models.gat import DenseGAT, GATNetwork, LatticeGAT  # noqa: F401
from mingraph_unet_tpu.models.mincut import MinCutRefinement, SegmentPredictor  # noqa: F401
from mingraph_unet_tpu.models.fusion import FeatureFusion  # noqa: F401
from mingraph_unet_tpu.models.detection import DetectionHead  # noqa: F401
from mingraph_unet_tpu.models.pipeline import MinGraphUNet  # noqa: F401
