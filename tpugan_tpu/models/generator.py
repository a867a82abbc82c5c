"""Upsampling generators: SRNet (with binary masking head) and NoMaskSRNet.

Equivalents of the reference's upsampling_network.py. Shapes are
channels-last throughout; the point-expansion layout matches the reference
exactly (copies of input point i occupy output slots i*r .. i*r + r - 1,
upsampling_network.py:136-138), and pruned points are parked at the 999
sentinel with an accompanying boolean mask instead of the reference's
variable-size squeeze (upsampling_network.py:140-155) so every shape stays
static under jit.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpugan_tpu import PAD_SENTINEL
from tpugan_tpu.nn.edgeconv import EdgeConv, IDGCNLayer
from tpugan_tpu.nn.layers import ConvLayer, SharedMLP


class GCNFeatureExtractor(nn.Module):
    """EdgeConv + stacked Inception-DenseGCN feature extractor (reference
    upsampling_network.py:7-41). Returns the concatenation of every
    IDGCN layer's output: [B, N, (layer_num-1) * dim]."""

    layer_num: int
    node_emb_dim: int = 128
    out_dim: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        feature: jnp.ndarray,              # [B, N, C_in]
        pos: Optional[jnp.ndarray] = None,  # graph by pos when C_in > 3
        train: bool = True,
        shared_idx: Optional[jnp.ndarray] = None,  # static-graph mode
    ) -> jnp.ndarray:
        x = EdgeConv(self.node_emb_dim, k=20, mlp_layer=True,
                     dtype=self.dtype)(feature, pos=pos, train=train,
                                       idx=shared_idx)
        outs = []
        for l in range(1, self.layer_num):
            out_dim = self.out_dim if l == self.layer_num - 1 else self.node_emb_dim
            x = IDGCNLayer(out_dim, residual=True,
                           dtype=self.dtype)(x, train=train,
                                             shared_idx=shared_idx)
            outs.append(x)
        return jnp.concatenate(outs, axis=-1)


class UpsamplingModule(nn.Module):
    """Feature-expansion head predicting r offset vectors per point
    (reference upsampling_network.py:44-74): two (bottleneck conv, EdgeConv)
    stages with k=12 then k=4, then a norm-free shared-MLP decoder and a
    final biased projection to 3*r."""

    upsample_ratio: int
    gcn_layer: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = True,
                 shared_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_dim = feature.shape[-1]
        out_dim = 3 * self.upsample_ratio
        for l in range(self.gcn_layer):
            k = 4 if l == self.gcn_layer - 1 else 12
            feature = ConvLayer(in_dim // 4, act=None,
                                dtype=self.dtype)(feature, train=train)
            feature = EdgeConv(in_dim, k=k, aggregate="max", mlp_layer=True,
                               dtype=self.dtype)(feature, train=train,
                                                 idx=shared_idx)
        feature = SharedMLP([out_dim // 2, out_dim],
                            dtype=self.dtype)(feature, train=train)
        # final offset projection promotes back to f32 (f32 params,
        # dtype=None) — predicted coordinates stay full precision
        feature = nn.Dense(out_dim, use_bias=True)(feature)
        return feature                                    # [B, N, 3r]


class BinaryMaskingModule(nn.Module):
    """Per-point keep-probability head (reference
    upsampling_network.py:77-104): like the upsampling head but the second
    EdgeConv uses sum aggregation without the inner MLP, and the decoder
    ends in a ReLU scalar."""

    gcn_layer: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feature: jnp.ndarray, train: bool = True,
                 shared_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_dim = feature.shape[-1]
        for l in range(self.gcn_layer):
            feature = ConvLayer(in_dim // 4, act=None,
                                dtype=self.dtype)(feature, train=train)
            if l != self.gcn_layer - 1:
                feature = EdgeConv(in_dim, k=12, aggregate="max",
                                   mlp_layer=True,
                                   dtype=self.dtype)(feature, train=train,
                                                     idx=shared_idx)
            else:
                feature = EdgeConv(in_dim, k=8, aggregate="sum",
                                   mlp_layer=False,
                                   dtype=self.dtype)(feature, train=train,
                                                     idx=shared_idx)
        feature = SharedMLP([in_dim // 2, in_dim // 4],
                            dtype=self.dtype)(feature, train=train)
        # Positive bias init keeps the ReLU head alive at initialization.
        # With zero bias the whole head can start identically dead (measured:
        # some seeds give mask ≡ 0 at emb_dim 128), which zeroes the masking
        # -loss gradient AND — through the hard gate — every offset gradient,
        # freezing the generator permanently. The reference risks the same
        # collapse with torch's random bias init; a small positive constant
        # is strictly more robust and reaches the same optima.
        feature = nn.Dense(
            1,
            use_bias=True,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
            bias_init=nn.initializers.constant(0.1),
        )(feature)
        return nn.relu(feature)[..., 0]                   # [B, N]


def expand_pos(pos: jnp.ndarray, edge: jnp.ndarray, r: int) -> jnp.ndarray:
    """Duplicate each point r times and add its r offset vectors.

    Layout identical to the reference (upsampling_network.py:136-138):
    output slot i*r + j is copy j of input point i.
    pos: [B, N, 3], edge: [B, N, 3r] -> [B, N*r, 3].
    """
    b, n, _ = pos.shape
    dup = jnp.repeat(pos, r, axis=1)                       # [B, N*r, 3]
    return dup + edge.reshape(b, n * r, 3)


def expand_pos_with_masking(
    pos: jnp.ndarray,
    edge: jnp.ndarray,
    mask: jnp.ndarray,
    r: int,
    epsilon: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked expansion (reference upsampling_network.py:131-157).

    The mask is binarized at ``epsilon`` under stop-gradient; masked points'
    offsets are zeroed (so all r copies collapse onto the input point), and
    the hard mask keeps copy 0 of every point unconditionally. Instead of
    the reference's dynamic-shape squeeze, pruned copies are parked at the
    999 sentinel and reported through ``valid``.

    Returns (expanded [B, N*r, 3], padded [B, N*r, 3], valid [B, N*r]).
    """
    b, n, _ = pos.shape
    gate = (jax.lax.stop_gradient(mask) > epsilon)[..., None]    # [B, N, 1]
    edge = edge * gate.astype(edge.dtype)
    expanded = expand_pos(pos, edge, r)

    hard = jnp.broadcast_to(gate, (b, n, r))
    hard = hard.at[:, :, 0].set(True)
    valid = hard.reshape(b, n * r)
    padded = jnp.where(valid[..., None], expanded, PAD_SENTINEL)
    return expanded, padded, valid


class SRNet(nn.Module):
    """Masked upsampling generator (reference upsampling_network.py:108-185).

    __call__ returns (expanded_pos, mask, padded_pos, valid):
      expanded_pos — all N*r candidate points (masked offsets zeroed),
      mask         — raw keep-probabilities [B, N],
      padded_pos   — hard-masked cloud, pruned copies at the 999 sentinel,
      valid        — boolean keep mask over the N*r slots.
    """

    in_feats: int
    node_emb_dim: int = 128
    upsample_ratio: int = 8
    feature_extractor_depth: int = 3
    epsilon: float = 0.01
    # bf16 inference mode: inner conv/gather activations in bfloat16 (f32
    # params; the offset projection and mask head promote back to f32, and
    # position expansion is always f32). None = exact f32 everywhere.
    compute_dtype: Optional[Any] = None
    # "dynamic": per-layer feature-space kNN rebuild, reference-exact
    # (gcn_lib/pointnet/gcn.py:150-212 rebuilds the graph in every layer).
    # "static": ONE k=20 kNN built from the input graph source (pos when
    # in_feats > 3, else the raw input feature = normalized pos) is reused
    # by every EdgeConv/IDGCN in the network — 7 kNN rounds become 1.
    # Inference-only approximation; bench.py gates it on prediction parity
    # against the dynamic forward, training always runs "dynamic".
    graph_mode: str = "dynamic"

    def setup(self):
        self.feature_extractor = GCNFeatureExtractor(
            layer_num=self.feature_extractor_depth,
            node_emb_dim=self.node_emb_dim,
            out_dim=self.node_emb_dim,
            dtype=self.compute_dtype,
        )
        self.upsampling_block = UpsamplingModule(self.upsample_ratio,
                                                 dtype=self.compute_dtype)
        self.filter_block = BinaryMaskingModule(dtype=self.compute_dtype)

    def _shared_idx(self, feature, graph_pos):
        if self.graph_mode != "static":
            return None
        from tpugan_tpu.ops.neighbors import graph_knn

        src = graph_pos if graph_pos is not None else feature
        _, idx = graph_knn(src, k=20)
        return idx

    def __call__(
        self,
        feature: jnp.ndarray,
        pos: jnp.ndarray,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        graph_pos = pos if self.in_feats > 3 else None
        shared_idx = self._shared_idx(feature, graph_pos)
        encoding = self.feature_extractor(feature, pos=graph_pos, train=train,
                                          shared_idx=shared_idx)
        edge = self.upsampling_block(encoding, train=train,
                                     shared_idx=shared_idx)
        mask = self.filter_block(encoding, train=train, shared_idx=shared_idx)
        expanded, padded, valid = expand_pos_with_masking(
            pos, edge, mask, self.upsample_ratio, self.epsilon
        )
        return expanded, mask, padded, valid

    def heads(self, feature, pos, train: bool = False):
        """Raw (edge, mask) heads, used by the rollout path."""
        graph_pos = pos if self.in_feats > 3 else None
        shared_idx = self._shared_idx(feature, graph_pos)
        encoding = self.feature_extractor(feature, pos=graph_pos, train=train,
                                          shared_idx=shared_idx)
        return (
            self.upsampling_block(encoding, train=train,
                                  shared_idx=shared_idx),
            self.filter_block(encoding, train=train, shared_idx=shared_idx),
        )


class RolloutMaskState(NamedTuple):
    """Fixed-shape ring buffer for the rollout's 25-frame mask-history
    average (reference upsampling_network.py:159-174).

    ``valid_buffer`` (optional, enabled via ``create(track_valid=True)``)
    records which rows were REAL points when each frame's mask was written.
    Ragged sequences pad frames to a shared bucket; without the validity
    ring, a row that is sentinel padding in a small frame would have its
    network mask blended into the keep/prune gate when a later, larger
    frame makes that row index real (up to ``history`` frames of
    pollution). With it, each row's mean runs over the frames in which the
    row actually existed."""

    buffer: jnp.ndarray  # [H, B, N]
    count: jnp.ndarray   # [] int32 — frames seen (saturates at H)
    ptr: jnp.ndarray     # [] int32 — next write slot
    valid_buffer: Optional[jnp.ndarray] = None  # [H, B, N] f32 0/1

    @classmethod
    def create(cls, batch: int, n: int, history: int = 25,
               track_valid: bool = False):
        return cls(
            buffer=jnp.zeros((history, batch, n), jnp.float32),
            count=jnp.zeros((), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            valid_buffer=(jnp.zeros((history, batch, n), jnp.float32)
                          if track_valid else None),
        )


def rollout_mask_update(
    state: RolloutMaskState, mask: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, RolloutMaskState]:
    """Clamp the mask like the reference rollout (values < 0.6 -> 0,
    values > 0.6 -> 0.6; upsampling_network.py:164-165), push it into the
    history ring, and return the running mean over observed frames.

    With a validity ring (``create(track_valid=True)``), ``valid`` [B, N]
    marks the rows that are real points this frame; each row's mean then
    runs over only the frames in which the row was real (padding rows of
    ragged sequences contribute nothing). For uniform sequences all rows
    are real every frame and the two forms agree bitwise."""
    h = state.buffer.shape[0]
    clamped = jnp.where(mask < 0.6, 0.0, jnp.where(mask > 0.6, 0.6, mask))
    if state.valid_buffer is None:
        buffer = jax.lax.dynamic_update_index_in_dim(
            state.buffer, clamped, state.ptr, axis=0
        )
        count = jnp.minimum(state.count + 1, h)
        ptr = (state.ptr + 1) % h
        mean = jnp.sum(buffer, axis=0) / count.astype(jnp.float32)
        return mean, RolloutMaskState(buffer, count, ptr)
    v = (jnp.ones_like(clamped) if valid is None
         else valid.astype(jnp.float32))
    buffer = jax.lax.dynamic_update_index_in_dim(
        state.buffer, clamped * v, state.ptr, axis=0
    )
    valid_buffer = jax.lax.dynamic_update_index_in_dim(
        state.valid_buffer, v, state.ptr, axis=0
    )
    count = jnp.minimum(state.count + 1, h)
    ptr = (state.ptr + 1) % h
    row_count = jnp.sum(valid_buffer, axis=0)
    mean = jnp.sum(buffer, axis=0) / jnp.maximum(row_count, 1.0)
    return mean, RolloutMaskState(buffer, count, ptr, valid_buffer)


class NoMaskSRNet(nn.Module):
    """Unmasked generator for the action workload (reference
    upsampling_network.py:189-223). Returns (expanded_pos, edge)."""

    in_feats: int
    node_emb_dim: int = 128
    upsample_ratio: int = 8
    feature_extractor_depth: int = 3
    compute_dtype: Optional[Any] = None
    graph_mode: str = "dynamic"   # see SRNet.graph_mode

    def setup(self):
        self.feature_extractor = GCNFeatureExtractor(
            layer_num=self.feature_extractor_depth,
            node_emb_dim=self.node_emb_dim,
            out_dim=self.node_emb_dim,
            dtype=self.compute_dtype,
        )
        self.upsampling_block = UpsamplingModule(self.upsample_ratio,
                                                 dtype=self.compute_dtype)

    def __call__(
        self, feature: jnp.ndarray, pos: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if feature.ndim == 2:
            feature = feature[None]
        if pos.ndim == 2:
            pos = pos[None]
        shared_idx = None
        if self.graph_mode == "static":
            from tpugan_tpu.ops.neighbors import graph_knn

            _, shared_idx = graph_knn(feature, k=20)
        encoding = self.feature_extractor(feature, train=train,
                                          shared_idx=shared_idx)
        edge = self.upsampling_block(encoding, train=train,
                                     shared_idx=shared_idx)
        out = expand_pos(pos, edge, self.upsample_ratio)
        return out, edge.reshape(out.shape[0], -1, 3)
