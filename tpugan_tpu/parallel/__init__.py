from tpugan_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_gan_step,
    initialize_distributed,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_gan_step",
    "initialize_distributed",
]
