from tpugan_tpu.models.generator import (
    GCNFeatureExtractor,
    UpsamplingModule,
    BinaryMaskingModule,
    SRNet,
    NoMaskSRNet,
    RolloutMaskState,
)
from tpugan_tpu.models.discriminator import (
    FluidSpatialDis,
    FluidTempoDis,
    ActionSpatialDis,
    ActionTempoDis,
    ActionCls,
    transfer_feature_extractor,
)

__all__ = [
    "GCNFeatureExtractor",
    "UpsamplingModule",
    "BinaryMaskingModule",
    "SRNet",
    "NoMaskSRNet",
    "RolloutMaskState",
    "FluidSpatialDis",
    "FluidTempoDis",
    "ActionSpatialDis",
    "ActionTempoDis",
    "ActionCls",
    "transfer_feature_extractor",
]
