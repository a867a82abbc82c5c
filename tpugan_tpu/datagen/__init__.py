from tpugan_tpu.datagen.scene_gen import (
    SIM_DEFAULTS,
    create_fluid_scene,
    run_simulator,
)
from tpugan_tpu.datagen.process import process_case, process_dataset

__all__ = [
    "SIM_DEFAULTS",
    "create_fluid_scene",
    "run_simulator",
    "process_case",
    "process_dataset",
]
