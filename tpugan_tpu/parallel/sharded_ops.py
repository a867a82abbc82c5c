"""Point-axis (N-axis) sharded neighbor ops — the context-parallel analog.

The reference never shards a single cloud (it patches host-side,
SURVEY.md §5); this is the designed TPU-native scale-out path for >=100k-
point frames: shard the query axis of one cloud across the mesh and
all-gather the candidate set over ICI (fluid neighborhoods are tiny — <=32
samples in a small radius — so a full candidate gather of [N, 3] floats is
cheap relative to the O(N^2/devices) distance work each chip keeps).

Exactness: each device computes exact kNN of its query shard against the
full candidate set, so results equal the unsharded op bit-for-bit (modulo
reduction order inside distances).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpugan_tpu.ops.neighbors import ball_query, knn
from tpugan_tpu.ops.metrics import nearest_neighbor
from tpugan_tpu.parallel.mesh import DATA_AXIS


def _pspec(axis_name):
    return P(None, axis_name, None)


def sharded_knn(
    query: jnp.ndarray,   # [B, Nq, D], Nq divisible by mesh size
    cand: jnp.ndarray,    # [B, Nc, D], Nc divisible by mesh size
    k: int,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN with both clouds N-axis sharded over the mesh."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_pspec(axis_name), _pspec(axis_name)),
        out_specs=(_pspec(axis_name), _pspec(axis_name)),
    )
    def inner(q_shard, c_shard):
        c_full = jax.lax.all_gather(c_shard, axis_name, axis=1, tiled=True)
        return knn(q_shard, c_full, k)

    return inner(query, cand)


def sharded_ball_query(
    query: jnp.ndarray,
    cand: jnp.ndarray,
    radius: float,
    nsample: int,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """pointnet2-semantics ball query with N-axis sharding."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_pspec(axis_name), _pspec(axis_name)),
        out_specs=_pspec(axis_name),
    )
    def inner(q_shard, c_shard):
        c_full = jax.lax.all_gather(c_shard, axis_name, axis=1, tiled=True)
        return ball_query(q_shard, c_full, radius, nsample)

    return inner(query, cand)


def sharded_chamfer(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> jnp.ndarray:
    """Bidirectional summed Chamfer with both clouds N-axis sharded: each
    device reduces nearest-neighbor distances for its query shard in both
    directions; partial sums meet in a psum over ICI. Returns [B]."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_pspec(axis_name), _pspec(axis_name)),
        out_specs=P(None),
    )
    def inner(a_shard, b_shard):
        a_full = jax.lax.all_gather(a_shard, axis_name, axis=1, tiled=True)
        b_full = jax.lax.all_gather(b_shard, axis_name, axis=1, tiled=True)
        d_ab, _ = nearest_neighbor(a_shard, b_full)
        d_ba, _ = nearest_neighbor(b_shard, a_full)
        partial_sum = jnp.sum(d_ab, axis=-1) + jnp.sum(d_ba, axis=-1)
        return jax.lax.psum(partial_sum, axis_name)

    return inner(a, b)
