"""Neighbor-search and grouping ops on padded point batches.

Design notes (TPU-first):

* Pairwise squared distances are computed as ``|q|^2 + |c|^2 - 2 q.c^T`` so
  the O(Nq*Nc*3) inner product runs on the MXU as a batched matmul instead of
  a broadcasted subtract (which would be VPU-bound and 3x the HBM traffic).
* Everything is fixed-shape. Ragged neighborhoods are expressed as top-k over
  masked distance rows; invalid candidates get +BIG distance so they are
  never selected. This is the padded-tensor equivalent of the reference's
  ``-1``-padded FRNN output (reference gcn_lib/pointnet/gcn.py:25-45).
* A key identity exploited throughout: the reference's
  ``ball_query(..., knn_padding=True)`` / ``ball_query_wrapper`` (reference
  gcn_lib/pointnet/gcn.py:25-45, discriminator.py:24-40) is exactly plain
  kNN: FRNN returns the K nearest neighbors *within radius* sorted by
  distance, which is a prefix of the global kNN list, and the kNN padding
  fills the remaining slots with precisely the global kNN entries. So one
  kNN kernel serves EdgeConv, FlowEmbedding and the loss queries.
* ``ball_query`` here reproduces the *index-order* semantics of
  pointnet2_ops' CUDA ball_query used inside ``QueryAndGroup`` (reference
  discriminator.py:190-192): first ``nsample`` candidates in index order
  whose distance is < radius, padded by repeating the first found (all zeros
  when nothing is in range).

For query counts above ``_CHUNK`` the [Nq, Nc] distance tile is never fully
materialized; we map over query chunks, which keeps peak memory at
``B * _CHUNK * Nc`` while XLA pipelines the chunk loop.
"""

from __future__ import annotations

import contextlib

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, NOT jnp: a module-scope jnp constant would initialize the XLA
# backend at import time, which breaks multi-host users — jax.distributed.
# initialize() must run before the first backend touch, and importing the
# package is the first thing any trainer does
# (tests/test_multiprocess.py pins this).
BIG = np.float32(1e10)

# Query-chunk size for memory-bounded neighbor searches. 2048 query rows
# against 16k candidates is a 128 MB f32 tile per batch element at most.
_CHUNK = 2048

# Candidate-count ceiling for the fused Pallas kNN kernel (VMEM scratch is
# TILE_Q * Nc * 4 bytes); beyond this the chunked XLA path takes over.
_PALLAS_MAX_NC = 24576

# Graph-topology kNN (EdgeConv/IDGCN feature-space graph builds) may use the
# approximate bf16 TPU kernel: the graph is a training detail, not an eval
# contract (reference gcn_lib/pointnet/gcn.py:13-22 rebuilds it every layer
# from evolving features). Toggle read at trace time; CLIs expose
# --exact_graph. Metrics, losses, ball queries and interpolation always run
# exact regardless of this flag.
APPROX_GRAPH_KNN = True


def set_approx_graph_knn(enabled: bool) -> None:
    global APPROX_GRAPH_KNN
    APPROX_GRAPH_KNN = bool(enabled)


# N-axis (point-axis) sharded serving context — the context-parallel analog
# the reference has no equivalent of (it patches big frames host-side,
# SURVEY.md §5). Entered only inside ``jax.shard_map`` bodies
# (parallel/sharded_serving.py): every point/feature tensor is a contiguous
# N-shard of the global cloud. Under the context, ``graph_knn`` all-gathers
# the candidate side over the named mesh axis — so each device computes the
# EXACT kNN of its query shard against the full cloud and the returned
# indices are GLOBAL point indices — and ``gather`` all-gathers the point
# table before indexing. Everything between graph builds and gathers in the
# generator is pointwise, so the model code runs unmodified.
_POINT_SHARD_AXIS: Optional[str] = None


@contextlib.contextmanager
def point_shard_axis(axis_name: Optional[str]):
    """Declare the mesh axis the point dimension is sharded over (trace-time
    toggle, like ``APPROX_GRAPH_KNN``; not thread-safe across concurrent
    traces)."""
    global _POINT_SHARD_AXIS
    prev, _POINT_SHARD_AXIS = _POINT_SHARD_AXIS, axis_name
    try:
        yield
    finally:
        _POINT_SHARD_AXIS = prev


def graph_knn(
    x: jnp.ndarray,
    k: int,
    c_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN for dynamic-graph construction; honors ``APPROX_GRAPH_KNN`` and
    the ``point_shard_axis`` serving context (global indices there)."""
    if _POINT_SHARD_AXIS is not None:
        cand = jax.lax.all_gather(x, _POINT_SHARD_AXIS, axis=1, tiled=True)
        cv = (jax.lax.all_gather(c_valid, _POINT_SHARD_AXIS, axis=1,
                                 tiled=True)
              if c_valid is not None else None)
        return knn(x, cand, k=k, c_valid=cv, approx=APPROX_GRAPH_KNN)
    return knn(x, k=k, c_valid=c_valid, approx=APPROX_GRAPH_KNN)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def pairwise_sqdist(query: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance between every query and candidate point.

    Args:
      query: [..., Nq, D]
      cand:  [..., Nc, D]
    Returns:
      [..., Nq, Nc] squared distances (clamped at 0 for numerical safety).
    """
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)          # [..., Nq, 1]
    c2 = jnp.sum(cand * cand, axis=-1, keepdims=True)            # [..., Nc, 1]
    # MXU path: batched [Nq, D] x [D, Nc]. Precision must be HIGHEST: the
    # TPU default runs matmuls through bf16 passes, and ~1e-2 distance error
    # flips nearest-neighbor selections.
    cross = jnp.einsum(
        "...qd,...cd->...qc",
        query,
        cand,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = q2 + jnp.swapaxes(c2, -1, -2) - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _masked_sqdist(
    query: jnp.ndarray,
    cand: jnp.ndarray,
    c_valid: Optional[jnp.ndarray],
) -> jnp.ndarray:
    d2 = pairwise_sqdist(query, cand)
    if c_valid is not None:
        d2 = jnp.where(c_valid[..., None, :], d2, BIG)
    return d2


def _chunked_query(fn, query: jnp.ndarray, chunk: int):
    """Apply ``fn(q_chunk) -> pytree`` over query-axis chunks of ``query``.

    query: [B, Nq, D]. Pads Nq up to a multiple of ``chunk`` (with zeros) and
    slices results back. fn must be shape-polymorphic only in static ways.
    """
    b, nq, d = query.shape
    if nq <= chunk:
        return fn(query)
    pad = (-nq) % chunk
    qp = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
    qc = qp.reshape(b, -1, chunk, d).swapaxes(0, 1)  # [nchunks, B, chunk, D]
    out = jax.lax.map(fn, qc)  # pytree of [nchunks, B, chunk, ...]
    def _restore(x):
        x = jnp.moveaxis(x, 0, 1)  # [B, nchunks, chunk, ...]
        x = x.reshape((b, nq + pad) + x.shape[3:])
        return x[:, :nq]
    return jax.tree_util.tree_map(_restore, out)


def knn(
    query: jnp.ndarray,
    cand: Optional[jnp.ndarray] = None,
    k: int = 16,
    c_valid: Optional[jnp.ndarray] = None,
    chunk: int = _CHUNK,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-nearest-neighbors, sorted ascending by distance.

    Equivalent of pytorch3d ``knn_points`` (reference
    gcn_lib/pointnet/gcn.py:13-22) and — per the identity documented in the
    module docstring — of the reference's kNN-padded ball queries.

    Args:
      query: [B, Nq, D]
      cand:  [B, Nc, D]; defaults to ``query`` (self-kNN includes self at
        distance 0, matching knn_points).
      k: number of neighbors.
      c_valid: optional [B, Nc] bool; invalid candidates are never selected.
      approx: allow the bf16 reduced-pass TPU kernel (feature-space graph
        builds only — a handful of queries may miss a tail neighbor; never
        used for metrics/losses). Off-TPU the flag is a no-op (exact).
    Returns:
      (sqdist [B, Nq, k], idx [B, Nq, k] int32)
    """
    if cand is None:
        cand = query
    if query.dtype == jnp.bfloat16:
        # bf16-activation callers (generator inference mode) still ride the
        # Pallas kernel: the f32 upcast is a cheap fused elementwise op and
        # the approx kernel re-downcasts its distance pass internally.
        query = query.astype(jnp.float32)
        cand = cand.astype(jnp.float32)
    nc = cand.shape[-2]
    k_eff = min(k, nc)

    if (
        _on_tpu()
        and query.ndim == 3
        and nc <= _PALLAS_MAX_NC
        and k_eff == k
        and query.dtype == jnp.float32
    ):
        from tpugan_tpu.ops.pallas.knn_kernel import knn_pallas

        if c_valid is None:
            bias = jnp.zeros(cand.shape[:-1], jnp.float32)
        else:
            bias = jnp.where(c_valid, 0.0, BIG)
        return knn_pallas(query, cand, bias, k, approx)

    def one_chunk(q):
        d2 = _masked_sqdist(q, cand, c_valid)
        neg, idx = jax.lax.top_k(-d2, k_eff)
        d2k, idxk = -neg, idx.astype(jnp.int32)
        if k_eff < k:
            # fewer candidates than requested neighbors: pad with BIG
            # distances (flagged out-of-range by radius_mask_knn) repeating
            # the last index.
            pad = k - k_eff
            d2k = jnp.concatenate(
                [d2k, jnp.full(d2k.shape[:-1] + (pad,), BIG)], axis=-1
            )
            idxk = jnp.concatenate(
                [idxk, jnp.broadcast_to(idxk[..., -1:], idxk.shape[:-1] + (pad,))],
                axis=-1,
            )
        return d2k, idxk

    return _chunked_query(one_chunk, query, chunk)


def radius_mask_knn(
    query: jnp.ndarray,
    cand: Optional[jnp.ndarray] = None,
    k: int = 16,
    radius: float = 0.1,
    c_valid: Optional[jnp.ndarray] = None,
    chunk: int = _CHUNK,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kNN restricted to a radius: the padded-tensor analog of FRNN's
    ``frnn_grid_points`` with ``-1`` padding (reference loss.py:105,142,229).

    Returns (sqdist, idx, in_range) where ``in_range[b, q, j]`` is True iff
    neighbor j is a real within-radius neighbor. Out-of-range slots keep the
    global-kNN index (callers that need the reference's -1 should use
    ``jnp.where(in_range, idx, -1)``); distances for such slots are the true
    kNN distances.
    """
    d2, idx = knn(query, cand, k, c_valid=c_valid, chunk=chunk)
    in_range = d2 < jnp.float32(radius) ** 2
    return d2, idx, in_range


def ball_query(
    query: jnp.ndarray,
    cand: jnp.ndarray,
    radius: float,
    nsample: int,
    c_valid: Optional[jnp.ndarray] = None,
    chunk: int = _CHUNK,
) -> jnp.ndarray:
    """pointnet2_ops-style ball query: first ``nsample`` candidates *in index
    order* with squared distance < radius^2; slots with no hit repeat the
    first found index (0 if the ball is empty). Reference call sites:
    ``QueryAndGroup`` inside every set-abstraction module
    (discriminator.py:141,190-192).

    Returns idx [B, Nq, nsample] int32.
    """
    nc = cand.shape[-2]
    r2 = jnp.float32(radius) ** 2

    if (
        _on_tpu()
        and query.ndim == 3
        and nc <= _PALLAS_MAX_NC
        and query.dtype == jnp.float32
    ):
        from tpugan_tpu.ops.pallas.ball_query_kernel import ball_query_pallas

        if c_valid is None:
            bias = jnp.zeros(cand.shape[:-1], jnp.float32)
        else:
            bias = jnp.where(c_valid, 0.0, 2.0)
        return ball_query_pallas(query, cand, radius, nsample, bias)

    def one_chunk(q):
        d2 = pairwise_sqdist(q, cand)
        within = d2 < r2
        if c_valid is not None:
            within = within & c_valid[..., None, :]
        # key = candidate index when within, else BIG; k smallest keys are the
        # first nsample hits in index order.
        iota = jax.lax.broadcasted_iota(jnp.int32, within.shape, within.ndim - 1)
        key = jnp.where(within, iota, jnp.int32(nc + 1))
        neg_key, _ = jax.lax.top_k(-key, min(nsample, nc))
        idx = -neg_key  # ascending candidate indices; nc+1 marks "no hit"
        if nsample > nc:
            # fewer candidates than sample slots: extra slots are "no hit"
            # (they fall back to the first found below)
            pad = jnp.full(idx.shape[:-1] + (nsample - nc,), nc + 1, jnp.int32)
            idx = jnp.concatenate([idx, pad], axis=-1)
        found = idx <= nc - 1
        first = jnp.where(found[..., :1], idx[..., :1], 0)
        return jnp.where(found, idx, first).astype(jnp.int32)

    return _chunked_query(one_chunk, query, chunk)


def fps(
    pos: jnp.ndarray,
    npoint: int,
    valid: Optional[jnp.ndarray] = None,
    start_idx: int = 0,
) -> jnp.ndarray:
    """Iterative farthest point sampling over a padded batch.

    Equivalent of pointnet2_ops ``furthest_point_sample`` (reference
    discriminator.py:114) which always starts from index 0. With ``valid``,
    invalid/dummy points are never selected — the deterministic, fixed-shape
    replacement for the reference's random dummy-resampling loop
    (discriminator.py:116-130).

    Sequential by nature: ``npoint`` rounds of (distance update, argmax) over
    a [B, N] min-distance state via fori_loop. This is the known TPU
    throughput ceiling for the discriminator path (SURVEY.md §7 hard part 1);
    keep npoint modest (<=2k) or sample host-side in the input pipeline.

    Returns idx [B, npoint] int32.
    """
    b, n, _ = pos.shape
    if valid is None:
        sel_penalty = jnp.zeros((b, n), dtype=jnp.float32)
    else:
        # Invalid points get -BIG min-distance so argmax never picks them.
        sel_penalty = jnp.where(valid, 0.0, -BIG)

    start = jnp.full((b,), start_idx, dtype=jnp.int32)
    if valid is not None:
        # If start_idx happens to be invalid for some batch row, move to the
        # first valid index.
        first_valid = jnp.argmax(valid, axis=-1).astype(jnp.int32)
        start_ok = jnp.take_along_axis(valid, start[:, None], axis=1)[:, 0]
        start = jnp.where(start_ok, start, first_valid)

    if _on_tpu() and pos.dtype == jnp.float32 and pos.shape[-1] == 3:
        from tpugan_tpu.ops.pallas.fps_kernel import fps_pallas

        return fps_pallas(pos, npoint, sel_penalty, start)

    idx0 = start
    sel0 = jnp.take_along_axis(pos, idx0[:, None, None], axis=1)  # [B,1,3]
    mind = jnp.sum((pos - sel0) ** 2, axis=-1) + sel_penalty       # [B,N]

    idx_buf = jnp.zeros((b, npoint), dtype=jnp.int32).at[:, 0].set(idx0)

    def body(i, carry):
        idx_buf, mind = carry
        nxt = jnp.argmax(mind, axis=-1).astype(jnp.int32)          # [B]
        idx_buf = idx_buf.at[:, i].set(nxt)
        sel = jnp.take_along_axis(pos, nxt[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((pos - sel) ** 2, axis=-1) + sel_penalty
        mind = jnp.minimum(mind, d)
        return idx_buf, mind

    idx_buf, _ = jax.lax.fori_loop(1, npoint, body, (idx_buf, mind))
    return idx_buf


def dilated_knn_graph(
    x: jnp.ndarray,
    k: int = 9,
    dilation: int = 1,
    c_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """k//dilation neighbor indices by dilated kNN (reference
    ``DilatedKnnGraph`` / ``Dilated``, gcn_lib/pointnet/gcn.py:48-93; the
    stochastic-epsilon mode there is dead code for the models and is not
    reproduced)."""
    _, idx = knn(x, k=k, c_valid=c_valid)
    return idx[:, :, ::dilation]


def knn_graph(x: jnp.ndarray, k: int = 9,
              c_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Plain kNN edge list (reference ``KNNGraph``,
    gcn_lib/graph_utils.py:65-87) as padded [B, N, k] indices."""
    _, idx = knn(x, k=k, c_valid=c_valid)
    return idx


def fixed_radius_graph(
    x: jnp.ndarray,
    radius: float,
    k: int = 32,
    c_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius-bounded neighbor list (reference ``FixedRadiusGraph``,
    gcn_lib/graph_utils.py:39-62): [B, N, k] indices + in-range mask; use
    ``jnp.where(mask, idx, -1)`` for the reference's -1 padding."""
    _, idx, in_range = radius_mask_knn(x, x, k=k, radius=radius,
                                       c_valid=c_valid)
    return idx, in_range


def gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched index gather: points [B, N, C], idx [B, M] -> [B, M, C].

    Equivalent of pointnet2_ops ``gather_operation`` / the reference's
    ``index_points`` (discriminator.py:43-60) in channels-last layout.

    Inside the ``point_shard_axis`` serving context, ``points`` is this
    device's N-shard and ``idx`` carries GLOBAL indices (the contract of the
    sharded ``graph_knn``): the table is all-gathered over ICI first.
    """
    if _POINT_SHARD_AXIS is not None:
        points = jax.lax.all_gather(points, _POINT_SHARD_AXIS, axis=1,
                                    tiled=True)
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Neighborhood gather: points [B, N, C], idx [B, M, K] -> [B, M, K, C].

    Equivalent of pointnet2_ops ``grouping_operation`` (reference
    gcn_lib/pointnet/gcn.py:207) in channels-last layout.
    """
    b, m, k = idx.shape
    flat = gather(points, idx.reshape(b, m * k))
    return flat.reshape(b, m, k, points.shape[-1])


def query_and_group(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    features: Optional[jnp.ndarray],
    radius: float,
    nsample: int,
    use_xyz: bool = True,
    c_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused ball query + grouping + relative-coordinate concat.

    Equivalent of pointnet2_ops ``QueryAndGroup`` (reference
    discriminator.py:190): groups ``nsample`` in-ball neighbors of each
    ``new_xyz`` center, recenters their coordinates, and concatenates grouped
    features.

    Args:
      xyz:      [B, N, 3] candidate coordinates.
      new_xyz:  [B, M, 3] query centers.
      features: [B, N, C] per-candidate features or None.
    Returns:
      [B, M, nsample, 3 + C] (or [B, M, nsample, C] when use_xyz=False;
      [B, M, nsample, 3] when features is None).
    """
    idx = ball_query(new_xyz, xyz, radius, nsample, c_valid=c_valid)
    grouped_xyz = group(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feat = group(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
        return grouped_feat
    assert use_xyz, "Cannot have not features and not use xyz as a feature!"
    return grouped_xyz


def group_all(
    xyz: jnp.ndarray,
    features: Optional[jnp.ndarray],
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Equivalent of pointnet2_ops ``GroupAll`` (reference
    discriminator.py:192): one group containing every point.

    Returns [B, 1, N, 3 + C].
    """
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_feat = features[:, None, :, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
        return grouped_feat
    return grouped_xyz


def radius_count(
    query: jnp.ndarray,
    cand: jnp.ndarray,
    radius: float,
    cap: Optional[int] = None,
    c_valid: Optional[jnp.ndarray] = None,
    include_self: bool = True,
    chunk: int = _CHUNK,
) -> jnp.ndarray:
    """Count candidates within ``radius`` of each query point.

    Replaces the reference's FRNN-based neighbor counting (masking loss,
    loss.py:261-267; free-surface detection, train_utils.py:269-272). With
    ``cap`` the count saturates at ``cap`` to mirror a K-limited FRNN query.

    Returns counts [B, Nq] int32.
    """
    r2 = jnp.float32(radius) ** 2

    def one_chunk(q):
        d2 = pairwise_sqdist(q, cand)
        within = d2 < r2
        if not include_self:
            within = within & (d2 > 1e-12)
        if c_valid is not None:
            within = within & c_valid[..., None, :]
        cnt = jnp.sum(within.astype(jnp.int32), axis=-1)
        if cap is not None:
            cnt = jnp.minimum(cnt, cap)
        return cnt

    return _chunked_query(one_chunk, query, chunk)
