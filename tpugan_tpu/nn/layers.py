"""Shared pointwise MLP primitives with optional batch/instance norm and
spectral norm.

Equivalents of the reference's ``build_shared_mlp`` / ``conv_bn_layer``
(gcn_lib/pointnet/gcn.py:96-147), the discriminator-flavored
``build_shared_mlp`` (discriminator.py:63-78) and ``MLP`` (gcn_lib/nn.py).

Bias quirk preserved from the reference: in the gcn_lib flavor the conv bias
is enabled exactly when a batch/instance norm follows (``bias=not use_bias``
with ``use_bias = norm not in ('batch','ins')``, gcn_lib/pointnet/gcn.py:98,
106) — i.e. *no* bias in the generator's norm-free convs. The
discriminator flavor is the usual ``bias = not bn`` (discriminator.py:68).
``use_bias`` is therefore an explicit knob here, set per call site.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def leaky_relu_001(x):
    # torch F.leaky_relu / nn.LeakyReLU() default slope
    return nn.leaky_relu(x, negative_slope=0.01)


def _norm_module(norm: str, train: bool):
    if norm == "batch":
        return nn.BatchNorm(use_running_average=not train, axis_name=None)
    if norm == "ins":
        # InstanceNorm2d over [B, C, N, K] normalizes per (B, C) across
        # (N, K); channels-last equivalent: GroupNorm with one group per
        # channel over the spatial axes. torch InstanceNorm2d default is
        # affine=False.
        return nn.GroupNorm(
            num_groups=None, group_size=1, use_bias=False, use_scale=False
        )
    if norm == "none":
        return None
    raise ValueError(f"Unsupported normalization: {norm}")


class ConvLayer(nn.Module):
    """One pointwise (1x1-conv-equivalent) Dense + optional norm + optional
    activation; reference ``conv_bn_layer`` (gcn_lib/pointnet/gcn.py:123-147).
    """

    features: int
    act: Optional[Callable] = None
    norm: str = "none"
    spectral_norm: bool = False
    use_bias: Optional[bool] = None  # None -> reference gcn_lib quirk
    # compute dtype: None keeps f32 (promotion of f32 params); bf16 halves
    # the HBM traffic of the activation tensors between convs/gathers and
    # runs the MXU at full bf16 rate. Params always stay f32.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        use_bias = self.use_bias
        if use_bias is None:
            use_bias = self.norm in ("batch", "ins")
        dense = nn.Dense(self.features, use_bias=use_bias, dtype=self.dtype)
        if self.spectral_norm:
            x = nn.SpectralNorm(dense)(x, update_stats=train)
        else:
            x = dense(x)
        norm = _norm_module(self.norm, train)
        if norm is not None:
            x = norm(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SharedMLP(nn.Module):
    """Stack of pointwise Dense layers, each followed by (optional) norm and
    an activation; reference ``build_shared_mlp`` — gcn_lib flavor uses
    LeakyReLU(0.2) (gcn_lib/pointnet/gcn.py:118), discriminator flavor
    defaults to ReLU with an overridable act_fn (discriminator.py:63-78).

    ``features`` lists the *output* widths (the reference's mlp_spec minus
    its first entry).
    """

    features: Sequence[int]
    act: Callable = leaky_relu_02
    norm: str = "none"
    spectral_norm: bool = False
    use_bias: Optional[bool] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for f in self.features:
            x = ConvLayer(
                f,
                act=self.act,
                norm=self.norm,
                spectral_norm=self.spectral_norm,
                use_bias=self.use_bias,
                dtype=self.dtype,
            )(x, train=train)
        return x


class MLP(nn.Module):
    """Plain dense MLP head (reference gcn_lib/nn.py:7-54)."""

    out_features: int
    hidden_dim: int = 128
    hidden_layers: int = 3
    act: Callable = nn.relu
    activation_first: bool = False
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.activation_first:
            x = self.act(x)
        for l in range(self.hidden_layers):
            last = l == self.hidden_layers - 1
            width = self.out_features if last else self.hidden_dim
            dense = nn.Dense(width)
            if self.spectral_norm:
                x = nn.SpectralNorm(dense)(x, update_stats=train)
            else:
                x = dense(x)
            if not last:
                x = self.act(x)
        return x
