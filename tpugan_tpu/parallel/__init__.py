from tpugan_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_gan_step,
    initialize_distributed,
)
from tpugan_tpu.parallel.sharded_ops import (
    sharded_ball_query,
    sharded_chamfer,
    sharded_knn,
)
from tpugan_tpu.parallel.sharded_serving import (
    make_sharded_rollout_step,
    rollout_sequence_sharded,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_gan_step",
    "initialize_distributed",
    "sharded_ball_query",
    "sharded_chamfer",
    "sharded_knn",
    "make_sharded_rollout_step",
    "rollout_sequence_sharded",
]
