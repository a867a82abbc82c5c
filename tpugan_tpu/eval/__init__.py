from tpugan_tpu.eval.rollout import rollout_sequence, make_rollout_step
from tpugan_tpu.eval.analysis import (
    position_metrics,
    action_position_metrics,
    pc_normalize,
    pad_clip_with_appropriate_size,
    cycle_consistency,
    get_particle_density,
    free_surface_particle_count_diff,
)

__all__ = [
    "rollout_sequence",
    "make_rollout_step",
    "position_metrics",
    "action_position_metrics",
    "pc_normalize",
    "pad_clip_with_appropriate_size",
    "cycle_consistency",
    "get_particle_density",
    "free_surface_particle_count_diff",
]
