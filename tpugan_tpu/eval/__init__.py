from tpugan_tpu.eval.rollout import rollout_sequence, make_rollout_step
from tpugan_tpu.eval.analysis import (
    position_metrics,
    cycle_consistency,
    get_particle_density,
    free_surface_particle_count_diff,
)

__all__ = [
    "rollout_sequence",
    "make_rollout_step",
    "position_metrics",
    "cycle_consistency",
    "get_particle_density",
    "free_surface_particle_count_diff",
]
