from ampnet_tpu.models.layers import PointMLP, SharedMLP, TNet
from ampnet_tpu.models.amp import (
    AMPNetClassifier,
    AMPNetSegmenter,
    WindowEncoder,
)
from ampnet_tpu.models.pointnet import (
    ClassificationPointNet,
    LightPointNetEncoder,
    ClassicPointNetEncoder,
    SegmentationPointNet,
)
