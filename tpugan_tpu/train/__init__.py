from tpugan_tpu.train.state import NetState, GanTrainState, make_optimizer
from tpugan_tpu.train.step import (
    build_fluid_models,
    build_action_models,
    init_fluid_state,
    init_action_state,
    make_fluid_gan_step,
    make_action_gan_step,
    get_rotation_matrix,
    advect_particle,
    rotate_lst,
    interpolate_vel_lst,
)
from tpugan_tpu.train.checkpoint import (
    save_checkpoint,
    save_checkpoint_async,
    load_checkpoint,
    ensure_dir,
)
from tpugan_tpu.train.torch_convert import (
    load_torch_checkpoint,
    convert_torch_checkpoint_dict,
    strip_spectral_norm,
)

__all__ = [
    "NetState",
    "GanTrainState",
    "make_optimizer",
    "build_fluid_models",
    "build_action_models",
    "init_fluid_state",
    "init_action_state",
    "make_fluid_gan_step",
    "make_action_gan_step",
    "get_rotation_matrix",
    "advect_particle",
    "rotate_lst",
    "interpolate_vel_lst",
    "save_checkpoint",
    "save_checkpoint_async",
    "load_checkpoint",
    "ensure_dir",
    "load_torch_checkpoint",
    "convert_torch_checkpoint_dict",
    "strip_spectral_norm",
]
