from tpugan_tpu.losses.geometry import (
    chamfer_distance_loss,
    masking_loss,
    tpugan_sr_loss,
    repulsion_loss,
    density_loss,
    dense_loss,
    edge_uniform_loss,
    temporal_loss,
    free_particle_loss,
    earth_mover_distance_loss,
)
from tpugan_tpu.losses.gan import (
    lsgan_labels,
    lsgan_generator_loss,
    lsgan_discriminator_loss,
)

__all__ = [
    "chamfer_distance_loss",
    "masking_loss",
    "tpugan_sr_loss",
    "repulsion_loss",
    "density_loss",
    "dense_loss",
    "edge_uniform_loss",
    "temporal_loss",
    "free_particle_loss",
    "earth_mover_distance_loss",
    "lsgan_labels",
    "lsgan_generator_loss",
    "lsgan_discriminator_loss",
]
