"""Device-mesh utilities and data-parallel train-step sharding.

The reference is strictly single-process/single-GPU (SURVEY.md §2.4); this
layer is the mandated TPU-native addition. Design: the GAN step in
tpugan_tpu.train.step is a *global-batch* pure function, so data
parallelism is purely a sharding annotation problem — parameters/optimizer
state replicated, the batch sharded along its B axis, and XLA/GSPMD inserts
the gradient all-reduces over ICI (the `psum`s the reference would have
needed NCCL for). No step-code changes, no hand-written collectives; the
same step runs on 1 chip, a v5e-8 slice, or a multi-host mesh.

Multi-host: call ``initialize_distributed()`` first (wraps
jax.distributed.initialize), build the mesh over ``jax.devices()`` (ICI
within a slice, DCN across), and feed each process its host-local shard of
the batch via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (no-op when single-process).

    With explicit cluster kwargs (coordinator_address/num_processes/...)
    a failure RAISES: silently proceeding single-process after the caller
    asked for a cluster hid a real import-order bug for a whole round
    (an import-time jnp constant initialized the XLA backend before this
    call — see ops/neighbors.py BIG and tests/test_multiprocess.py)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        if kwargs:
            raise
        # auto-detection outside a cluster: legitimate single-process run


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
) -> Mesh:
    """1-D data mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(len(devices)), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, batch_axis: int = 1) -> NamedSharding:
    """Sharding for frame-major [F, B, N, 3] batch arrays: shard B over the
    data axis."""
    spec = [None] * batch_axis + [DATA_AXIS]
    return NamedSharding(mesh, P(*spec))


def shard_gan_step(step_fn, mesh: Mesh):
    """Wrap an (unjitted) GAN step for data-parallel execution.

    state -> replicated, batch dict -> B-axis sharded, rng key ->
    replicated; outputs replicated. Gradient all-reduce over ICI is derived
    by GSPMD from the replicated-output constraint.
    """
    repl = replicated(mesh)
    data = batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def device_put_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh with B-axis sharding."""
    data = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, data), batch)


def device_put_replicated(tree, mesh: Mesh):
    repl = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), tree)


def host_local_batch_to_global(batch, mesh: Mesh, batch_axis: int = 1):
    """Multi-host input sharding: each process holds its local slice of the
    global batch; assemble global arrays addressable by the mesh. This is
    the per-host data sharding of SURVEY.md §2.4's TPU-native plan."""
    sharding = batch_sharded(mesh, batch_axis)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, a), batch
    )
