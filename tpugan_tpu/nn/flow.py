"""FlowNet3D-style flow embedding across frames.

Equivalent of the reference's FlowEmbedding / FlowModule
(discriminator.py:235-322). The reference's neighbor search
(``ball_query_wrapper`` = FRNN-with-kNN-padding) is exactly plain kNN — see
tpugan_tpu/ops/neighbors.py docstring — so one kNN call serves here; the
``radius`` argument is kept for API parity but, as in the reference, has no
effect on the selected neighbors.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tpugan_tpu.nn.layers import ambient_batch_norm, leaky_relu_001
from tpugan_tpu.ops.neighbors import group, knn


class FlowEmbedding(nn.Module):
    """Correlate two frames: for each point in frame 1 gather 32 nearest
    points of frame 2, concat [pos_diff, feat2_grouped, feat1_tiled],
    conv+BN+leaky_relu stack, max-pool over neighbors
    (reference discriminator.py:235-283; note the torch-default 0.01
    leaky slope there, unlike the 0.2 used elsewhere)."""

    mlp: Sequence[int]
    nsample: int = 32
    spectral_norm: bool = False

    @nn.compact
    def __call__(
        self,
        pos1: jnp.ndarray,    # [B, N, 3]
        pos2: jnp.ndarray,    # [B, N, 3]
        feat1: jnp.ndarray,   # [B, N, C]
        feat2: jnp.ndarray,   # [B, N, C]
        radius: float = 0.0,  # API parity only; see module docstring
        train: bool = True,
    ) -> jnp.ndarray:
        _, idx = knn(pos1, pos2, k=self.nsample)
        pos_diff = group(pos2, idx) - pos1[:, :, None, :]      # [B,N,S,3]
        feat2_grouped = group(feat2, idx)                       # [B,N,S,C]
        feat1_tiled = jnp.broadcast_to(
            feat1[:, :, None, :], feat2_grouped.shape
        )
        y = jnp.concatenate([pos_diff, feat2_grouped, feat1_tiled], axis=-1)
        for i, width in enumerate(self.mlp):
            dense = nn.Dense(width, use_bias=False)
            if self.spectral_norm:
                y = nn.SpectralNorm(dense)(y, update_stats=train)
            else:
                y = dense(y)
            y = ambient_batch_norm(train, name=f"BatchNorm_{i}")(y)
            y = leaky_relu_001(y)
        return jnp.max(y, axis=2)                               # [B, N, C']


class FlowModule(nn.Module):
    """Pyramidal pairwise flow mixing over a frame window (reference
    discriminator.py:286-322): at depth d, every adjacent pair of the
    current feature list is correlated with the depth-d FlowEmbedding,
    shrinking the list by one; after seq_len-1 depths one feature remains.
    """

    in_features: int
    hidden_features: int
    out_features: int
    sequence_length: int
    spectral_norm: bool = False

    def setup(self):
        if self.sequence_length < 2:
            raise ValueError(
                "Flow module only accepts sequences of length > 1"
            )
        depth = self.sequence_length - 1
        hidden = self.out_features if depth == 1 else self.hidden_features
        layers = []
        for d in range(depth):
            if d == 0:
                mlp = [self.in_features, hidden // 2, hidden]
            elif d == depth - 1:
                mlp = [hidden, self.out_features, self.out_features]
            else:
                mlp = [hidden, hidden // 2, hidden]
            layers.append(FlowEmbedding(mlp=mlp, spectral_norm=self.spectral_norm))
        self.flow_emb_layers = layers

    def __call__(
        self,
        feature_lst: List[jnp.ndarray],  # seq of [B, N, C]
        pos_lst: List[jnp.ndarray],      # seq of [B, N, 3]
        cutoff: float = 0.0,
        train: bool = True,
    ) -> jnp.ndarray:
        assert len(feature_lst) == self.sequence_length
        feats = list(feature_lst)
        for d in range(self.sequence_length - 1):
            layer = self.flow_emb_layers[d]
            mixed = []
            for l in range(len(feats) - 1):
                mixed.append(
                    layer(pos_lst[l], pos_lst[l + 1], feats[l], feats[l + 1],
                          radius=cutoff, train=train)
                )
            feats = mixed
        assert len(feats) == 1
        return feats[0]
