"""EdgeConv and Inception-DenseGCN layers (PU-GCN style).

Equivalents of the reference's batched-tensor GNN flavor
(gcn_lib/pointnet/gcn.py:150-279). The kNN graph is rebuilt on every call
from feature or coordinate space, exactly like the reference; the
graph-build + gather + affine + aggregate chain is expressed so XLA fuses
the elementwise work into the surrounding matmuls.
"""

from __future__ import annotations

import os

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from tpugan_tpu.nn.layers import ConvLayer, SharedMLP, leaky_relu_02
from tpugan_tpu.ops.neighbors import gather, graph_knn, group


# TPUGAN_FUSED_EDGECONV_TRAIN=1 also enables the kernel in TRAINING graphs
# (it carries a real Pallas backward, edgeconv_kernel._bwd_pallas; forward
# bit-exact vs XLA, backward equal to fp-reduction order). Default OFF: at
# the fluid workload's train shapes (N=1152 input patches) the XLA grouped
# path measured slightly faster (10.2 vs 11.2 ms G fwd+bwd) — the fused
# win grows with N (serving N=10240: 6.93 -> 4.38 ms); opt in for
# large-cloud training.
_TRAIN_FUSED = os.environ.get("TPUGAN_FUSED_EDGECONV_TRAIN", "0") == "1"


def _fused_enabled(fused: Optional[bool], train: bool, norm: str,
                   spectral_norm: bool) -> bool:
    """The fused post-gather kernel applies to the bias-free norm-free
    configuration (the generator); None = auto (inference always; training
    only with TPUGAN_FUSED_EDGECONV_TRAIN=1)."""
    on = fused if fused is not None else ((not train) or _TRAIN_FUSED)
    return on and norm == "none" and not spectral_norm


def _gather_neighbor_major(feat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather a NEIGHBOR-MAJOR [B, K, N, C] table (plane j = neighbor j of
    every point) — the fused kernel's layout; same gather cost as the
    point-major order, only the (tiny) index tensor is transposed."""
    b, n, k = idx.shape
    idx_t = jnp.swapaxes(idx, 1, 2).reshape(b, k * n)
    return gather(feat, idx_t).reshape(b, k, n, feat.shape[-1])


def _aggregate(y: jnp.ndarray, mode: str) -> jnp.ndarray:
    # y: [B, N, K, C] -> [B, N, C]
    if mode == "max":
        return jnp.max(y, axis=2)
    if mode == "sum":
        return jnp.sum(y, axis=2)
    if mode == "min":
        return jnp.min(y, axis=2)
    if mode == "mean":
        return jnp.mean(y, axis=2)
    raise ValueError(f"Unsupported aggregation mode {mode}")


class EdgeConv(nn.Module):
    """Dynamic-graph edge convolution (reference
    gcn_lib/pointnet/gcn.py:150-212).

    For each point: gather k (dilated) nearest neighbors (by ``pos`` when
    given, else by feature distance), form edge features (neighbor - center),
    apply node/edge affines, a shared MLP, and aggregate over neighbors.
    """

    out_features: int
    k: int = 9
    dilation: int = 1
    mlp_layer: bool = True
    aggregate: str = "max"
    norm: str = "none"
    spectral_norm: bool = False
    # bf16 compute halves the [B, N, k, C] grouped tensors' HBM traffic
    # (gathers and layout copies dominate the forward); params stay f32.
    dtype: Optional[Any] = None
    # Fused post-gather Pallas kernel (ops/pallas/edgeconv_kernel.py):
    # affines + SharedMLP + aggregation in VMEM, no grouped [B, N, k, C']
    # intermediates in HBM. None = auto (inference calls only, train=False);
    # True/False force. Applies only to the norm-free, spectral-norm-free
    # configuration (the generator); other configs always take the XLA path.
    fused: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        feat: jnp.ndarray,                 # [B, N, C]
        pos: Optional[jnp.ndarray] = None,  # [B, N, 3]
        train: bool = True,
        idx: Optional[jnp.ndarray] = None,  # precomputed kNN [B, N, >=k]
        neighbor: Optional[jnp.ndarray] = None,  # pregathered [B, N, >=k, C]
        neighbor_t: Optional[jnp.ndarray] = None,  # pregathered [B, >=k, N, C]
    ) -> jnp.ndarray:
        # dilated kNN: k neighbors, stride `dilation` (reference Dilated,
        # gcn_lib/pointnet/gcn.py:48-72; stochastic mode unused by models).
        # Callers that already hold a kNN list over the same graph source
        # (IDGCNLayer's three branches share one) pass it via ``idx`` — or
        # the gathered neighbor table itself via ``neighbor`` so the gather
        # runs once per layer instead of once per branch.
        half = self.out_features // 2
        # (A gather-hoisted variant — affines on ungrouped rows, gather
        # after — was measured SLOWER on TPU: it halves each gathered
        # table's width but doubles the number of gathers and their
        # layout-fixup copies, 22.0 -> 25.6 ms on the 10240-pt forward.
        # The grouped affines stay; see BENCH_NOTES.md round 2.)
        if self.dtype is not None:
            feat = feat.astype(self.dtype)
        use_fused = (
            _fused_enabled(self.fused, train, self.norm, self.spectral_norm)
            and (self.mlp_layer or self.aggregate in ("sum", "mean"))
        )
        if neighbor is None and neighbor_t is None:
            if idx is None:
                graph_src = pos if pos is not None else feat
                _, idx = graph_knn(graph_src, k=self.k)
            idx = idx[:, :, : self.k : self.dilation]
            if use_fused:
                neighbor_t = _gather_neighbor_major(feat, idx)  # [B, k', N, C]
            else:
                neighbor = group(feat, idx)                     # [B, N, k', C]
        elif neighbor_t is not None:
            neighbor_t = neighbor_t[:, : self.k : self.dilation]
            if self.dtype is not None:
                neighbor_t = neighbor_t.astype(self.dtype)
        else:
            neighbor = neighbor[:, :, : self.k : self.dilation]
            if self.dtype is not None:
                neighbor = neighbor.astype(self.dtype)
        node_affine = ConvLayer(half, act=leaky_relu_02, norm=self.norm,
                                spectral_norm=self.spectral_norm,
                                dtype=self.dtype)
        edge_affine = ConvLayer(half, act=leaky_relu_02, norm=self.norm,
                                spectral_norm=self.spectral_norm,
                                dtype=self.dtype)

        use_fused = use_fused and neighbor_t is not None
        if neighbor is None and not use_fused:
            # pregathered table in the wrong order for the chosen path
            neighbor = jnp.swapaxes(neighbor_t, 1, 2)
        if use_fused:
            # Probe calls keep the param creation order/names identical to
            # the XLA path (checkpoint-compatible), then the fused kernel
            # consumes the raw (bias-free) Dense kernels directly.
            probe = jnp.zeros_like(feat[:, :1])
            _ = node_affine(probe, train=train)
            _ = edge_affine(probe, train=train)
            if self.mlp_layer:
                mlp = SharedMLP([half, self.out_features], norm=self.norm,
                                spectral_norm=self.spectral_norm,
                                dtype=self.dtype)
                _ = mlp(jnp.zeros(probe.shape[:-1] + (half,), probe.dtype),
                        train=train)
            p = self.variables["params"]
            wn = p["ConvLayer_0"]["Dense_0"]["kernel"]
            we = p["ConvLayer_1"]["Dense_0"]["kernel"]
            if self.mlp_layer:
                w1 = p["SharedMLP_0"]["ConvLayer_0"]["Dense_0"]["kernel"]
                w2 = p["SharedMLP_0"]["ConvLayer_1"]["Dense_0"]["kernel"]
            else:
                w1 = w2 = None
            from tpugan_tpu.ops.pallas.edgeconv_kernel import edgeconv_fused

            cdt = self.dtype if self.dtype is not None else feat.dtype
            y = edgeconv_fused(neighbor_t, feat, wn, we, w1, w2,
                               aggregate=self.aggregate, compute_dtype=cdt)
            if self.mlp_layer:
                return y                               # [B, N, C_out]
            head = ConvLayer(self.out_features, act=None, norm=self.norm,
                             spectral_norm=self.spectral_norm,
                             dtype=self.dtype)
            return head(y, train=train)

        edge = neighbor - feat[:, :, None, :]
        y = (node_affine(neighbor, train=train)
             + edge_affine(edge, train=train))

        if self.mlp_layer:
            y = SharedMLP([half, self.out_features], norm=self.norm,
                          spectral_norm=self.spectral_norm,
                          dtype=self.dtype)(y, train=train)
            return _aggregate(y, self.aggregate)        # [B, N, C_out]

        head = ConvLayer(self.out_features, act=None, norm=self.norm,
                         spectral_norm=self.spectral_norm, dtype=self.dtype)
        if self.norm == "none" and self.aggregate in ("sum", "mean"):
            # linear head commutes with linear aggregation: aggregate the
            # half-width tensor first, then one ungrouped conv
            return head(_aggregate(y, self.aggregate), train=train)
        return _aggregate(head(y, train=train), self.aggregate)


class IDGCNLayer(nn.Module):
    """Inception-DenseGCN layer from PU-GCN (reference
    gcn_lib/pointnet/gcn.py:215-279): bottleneck, then three parallel
    branches (local kNN max pool, EdgeConv d=1, EdgeConv d=2), concat,
    decode, optional layer norm, residual skip."""

    out_features: int
    norm: str = "none"
    layer_norm: bool = False
    residual: bool = True
    spectral_norm: bool = False
    dtype: Optional[Any] = None
    fused: Optional[bool] = None   # see EdgeConv.fused

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = True,
                 shared_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = feat.shape[-1]
        btn = ConvLayer(c // 4, act=None, norm=self.norm,
                        spectral_norm=self.spectral_norm, dtype=self.dtype)
        x = btn(feat, train=train)                  # [B, N, C/4]

        # All three branches (reference gcn_lib/pointnet/gcn.py:258-265)
        # build graphs from the same bottleneck features: local kNN is the
        # 9-prefix and the dilated EdgeConv the ::2 stride of one shared
        # kNN(20) list — identical results, one kernel AND one neighbor
        # gather instead of three (the branches slice the gathered table).
        # Static-graph inference mode passes the model-wide list instead.
        if shared_idx is not None:
            idx20 = shared_idx
        else:
            _, idx20 = graph_knn(x, k=20)
        fused = _fused_enabled(self.fused, train, self.norm,
                               self.spectral_norm)
        if fused:
            # neighbor-major table for the fused branches; local max is the
            # fold over the first 9 planes (identical values, axis swapped)
            nbr_t = _gather_neighbor_major(x, idx20)            # [B, 20, N, C/4]
            local_max = jnp.max(nbr_t[:, :9], axis=1)           # [B, N, C/4]
            nbr_kw1 = {"neighbor_t": nbr_t}
            nbr_kw2 = {"neighbor_t": nbr_t}
        else:
            nbr20 = group(x, idx20)                             # [B, N, 20, C/4]
            local_max = jnp.max(nbr20[:, :, :9], axis=2)        # [B, N, C/4]
            nbr_kw1 = {"neighbor": nbr20}
            nbr_kw2 = {"neighbor": nbr20}

        feat1 = EdgeConv(c // 4, k=20, dilation=1, norm=self.norm,
                         spectral_norm=self.spectral_norm, fused=self.fused,
                         dtype=self.dtype)(x, train=train, **nbr_kw1)
        feat2 = EdgeConv(c // 4, k=20, dilation=2, norm=self.norm,
                         spectral_norm=self.spectral_norm, fused=self.fused,
                         dtype=self.dtype)(x, train=train, **nbr_kw2)

        y = jnp.concatenate([local_max, feat1, feat2], axis=-1)
        y = ConvLayer(self.out_features, act=leaky_relu_02, norm=self.norm,
                      spectral_norm=self.spectral_norm,
                      dtype=self.dtype)(y, train=train)

        if self.layer_norm:
            y = nn.LayerNorm()(y)
        if self.residual:
            skip = ConvLayer(self.out_features, act=None, norm=self.norm,
                             spectral_norm=self.spectral_norm,
                             dtype=self.dtype)(feat, train=train)
            y = y + skip
        return y
