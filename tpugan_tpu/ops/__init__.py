"""Neighborhood & geometry kernel library.

TPU-native replacements for the reference's out-of-tree CUDA extensions
(reference README.md:4-15): pointnet2_ops (FPS / gather / grouping /
QueryAndGroup), FRNN fixed-radius kNN, pytorch3d `knn_points`, chamferdist,
and the MSN auction EMD. All ops work on fixed-shape padded `[B, N, 3]`
batches with explicit validity masks and are jit/vmap/grad compatible.
"""

from tpugan_tpu.ops.neighbors import (
    pairwise_sqdist,
    knn,
    ball_query,
    radius_mask_knn,
    fps,
    gather,
    group,
    query_and_group,
    radius_count,
)
from tpugan_tpu.ops.metrics import (
    chamfer,
    nearest_neighbor,
    masking_target,
    auction_assignment,
    emd_loss,
    gaussian_mmd,
)
from tpugan_tpu.ops.interpolate import (
    bicubic_kernel,
    linear_kernel,
    exponential_kernel,
    cubic_interpolation,
    cubic_interpolation_dense,
)

__all__ = [
    "pairwise_sqdist",
    "knn",
    "ball_query",
    "radius_mask_knn",
    "fps",
    "gather",
    "group",
    "query_and_group",
    "radius_count",
    "chamfer",
    "nearest_neighbor",
    "masking_target",
    "auction_assignment",
    "emd_loss",
    "gaussian_mmd",
    "bicubic_kernel",
    "linear_kernel",
    "exponential_kernel",
    "cubic_interpolation",
    "cubic_interpolation_dense",
]
