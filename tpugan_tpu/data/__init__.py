from tpugan_tpu.data.sampling import (
    farthest_point_sampling,
    normalize_point_cloud,
    sample_patch_with_fps,
    voxel_downsample,
    get_free_surface_particles,
)
from tpugan_tpu.data.synthetic import (
    make_synthetic_fluid_dataset,
    synthetic_fluid_sequence,
)
from tpugan_tpu.data.fluid import SiamFluidDataset, fluid_batch_iterator
from tpugan_tpu.data.msr import MSRAction3DDataset, action_batch_iterator

__all__ = [
    "farthest_point_sampling",
    "normalize_point_cloud",
    "sample_patch_with_fps",
    "voxel_downsample",
    "get_free_surface_particles",
    "make_synthetic_fluid_dataset",
    "synthetic_fluid_sequence",
    "SiamFluidDataset",
    "fluid_batch_iterator",
    "MSRAction3DDataset",
    "action_batch_iterator",
]
