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

import contextlib
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Grouped-statistics batch norm context.
#
# The reference's temporal towers apply the SAME BatchNorm-bearing module
# several times per train step (once per frame, and once for the fake and
# once for the real batch in the D update — discriminator.py:366-401,518-559;
# train_step_final.py:185-216). Each torch call normalizes with ITS OWN batch
# statistics. Stacking those calls into one big batched apply (better MXU
# utilization, ~F x fewer dispatches) therefore must NOT pool the statistics:
# inside `with stat_groups(G):` every batch-norm created by ConvLayer /
# FlowEmbedding / _FCHead treats the leading axis as G equal row-blocks,
# normalizes each block with its own statistics, and replays the running-
# average EMA once per block in block order — reproducing G sequential
# flax/torch BatchNorm calls exactly (pinned by tests/test_fast_d.py).
# Trace-time Python state (same pattern as setconv._FUSED_TRAIN): set it
# around `module.apply(...)` calls while they trace.
_STAT_GROUPS = 1


@contextlib.contextmanager
def stat_groups(n: int):
    """All batch norms created under this context compute per-row-block
    statistics for ``n`` equal blocks of the leading axis."""
    global _STAT_GROUPS
    prev = _STAT_GROUPS
    _STAT_GROUPS = int(n)
    try:
        yield
    finally:
        _STAT_GROUPS = prev


class GroupedBatchNorm(nn.Module):
    """BatchNorm whose leading axis holds ``groups`` stacked sub-batches,
    each normalized with its own statistics — bit-equal to ``groups``
    sequential ``nn.BatchNorm`` train-mode calls on the blocks (same f32
    fast-variance stats, same EMA order, same variable names, so it binds
    the checkpoint tree ``nn.BatchNorm`` created)."""

    groups: int
    momentum: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        g = self.groups
        if x.shape[0] % g:
            raise ValueError(
                f"leading axis {x.shape[0]} not divisible into "
                f"{g} stat groups")
        xg = x.reshape((g, x.shape[0] // g) + x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))
        x32 = xg.astype(jnp.float32)
        mu = jnp.mean(x32, axes)                               # [G, C]
        mu2 = jnp.mean(jnp.square(x32), axes)
        var = jnp.maximum(0.0, mu2 - jnp.square(mu))           # [G, C]
        if not self.is_initializing():
            rm, rv = ra_mean.value, ra_var.value
            for i in range(g):       # replay EMA per block, in block order
                rm = self.momentum * rm + (1 - self.momentum) * mu[i]
                rv = self.momentum * rv + (1 - self.momentum) * var[i]
            ra_mean.value = rm
            ra_var.value = rv
        shape = (g,) + (1,) * len(axes) + (c,)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x32 - mu.reshape(shape)) * mul.reshape(shape)
        y = y + bias
        # flax nn.BatchNorm with dtype=None promotes low-precision inputs to
        # the f32 param dtype; match it so the sequential-path bit-equality
        # contract holds for bf16 towers too (ADVICE round 4)
        return y.reshape(x.shape).astype(jnp.result_type(x, jnp.float32))


def ambient_batch_norm(train: bool, name: Optional[str] = None):
    """A batch-norm module honoring the ambient ``stat_groups`` context.

    Grouped instances are constructed under the name ``nn.BatchNorm`` would
    have received so both modes bind the same variable tree. Callers that
    create several norms in one scope must pass explicit ``BatchNorm_{i}``
    names (flax auto-numbering is per-class, which would diverge)."""
    if _STAT_GROUPS > 1 and train:
        return GroupedBatchNorm(groups=_STAT_GROUPS,
                                name=name or "BatchNorm_0")
    return nn.BatchNorm(use_running_average=not train, axis_name=None,
                        name=name)


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def leaky_relu_001(x):
    # torch F.leaky_relu / nn.LeakyReLU() default slope
    return nn.leaky_relu(x, negative_slope=0.01)


def act_slope(act: Callable) -> Optional[float]:
    """Leaky-ReLU slope of a supported activation (0 = ReLU), else None."""
    if act is nn.relu or act is jax.nn.relu:
        return 0.0
    if act is leaky_relu_001:
        return 0.01
    if act is leaky_relu_02:
        return 0.2
    return None


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
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 fused_op: Optional[str] = None, bn_stats=None):
        """Normal mode (fused_op=None) applies Dense -> norm -> act.

        The two ``fused_op`` modes serve SharedMLP's fused pooled path
        (ops/pallas/pooled_mlp_kernel.py). Both keep module creation, names
        and state updates IDENTICAL to the normal path, so checkpoints and
        the torch converter see the same tree:

        - "weights": ``x`` only conveys (C_in, dtype). Probes the (spectral-
          normalized) Dense with an identity matrix — the output IS the
          differentiable effective kernel, and SpectralNorm's u/sigma power
          iteration advances exactly once, as a real call would. Returns
          (W_eff [C_in, F], dense_bias or None); the norm module is created
          later by "bn_update".
        - "bn_update": creates the BatchNorm with the normal flag wiring and
          (at train) feeds it a 2-point probe stack([mu-s, mu+s]) whose
          batch moments are exactly (mu, var = s^2) — the running-average
          update matches a real call on data with those moments. Returns
          the (post-call) stored running (mean, var) for eval affines.
        """
        use_bias = self.use_bias
        if use_bias is None:
            use_bias = self.norm in ("batch", "ins")

        if fused_op == "bn_update":
            assert _STAT_GROUPS == 1, (
                "fused SetConv path does not support stat_groups; "
                "SharedMLP._fusable must gate it off")
            norm = _norm_module(self.norm, train)
            if norm is None:
                return None
            if train:
                mu, var = bn_stats
                s = jnp.sqrt(jnp.maximum(var, 0.0))
                probe = jnp.stack([mu - s, mu + s])[None]      # [1, 2, F]
            else:
                probe = jnp.zeros((1, 2, self.features), jnp.float32)
            _ = norm(probe)                                     # update/create
            stats = self.variables.get("batch_stats", {}).get(
                "BatchNorm_0", None)
            if stats is None:                                   # init trace
                return (jnp.zeros((self.features,), jnp.float32),
                        jnp.ones((self.features,), jnp.float32))
            return stats["mean"], stats["var"]

        dense = nn.Dense(self.features, use_bias=use_bias, dtype=self.dtype)

        if fused_op == "weights":
            cin = x.shape[-1]
            probe = jnp.eye(cin, dtype=x.dtype)
            if use_bias:
                probe = jnp.concatenate(
                    [probe, jnp.zeros((1, cin), x.dtype)], axis=0)
            if self.spectral_norm:
                out = nn.SpectralNorm(dense)(probe, update_stats=train)
            else:
                out = dense(probe)
            if use_bias:
                return out[:cin] - out[cin:cin + 1], out[cin]
            return out, None

        if self.spectral_norm:
            x = nn.SpectralNorm(dense)(x, update_stats=train)
        else:
            x = dense(x)
        if self.norm == "batch":
            x = ambient_batch_norm(train)(x)
        else:
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

    def _fusable(self, x: jnp.ndarray) -> bool:
        return (x.ndim == 4 and self.dtype is None
                and self.norm in ("batch", "none")
                and act_slope(self.act) is not None
                and _STAT_GROUPS == 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 fused_pool: bool = False) -> jnp.ndarray:
        """fused_pool=True: return act-stack + MAX over axis 2 as one fused
        op ([B, M, ns, C] -> [B, M, C_out]); the per-layer grouped
        intermediates never reach HBM (ops/pallas/pooled_mlp_kernel.py).
        Falls back to the plain stack + jnp.max for unsupported configs —
        the caller always gets the pooled result."""
        if fused_pool and self._fusable(x):
            return self._fused_pooled(x, train)
        for f in self.features:
            x = ConvLayer(
                f,
                act=self.act,
                norm=self.norm,
                spectral_norm=self.spectral_norm,
                use_bias=self.use_bias,
                dtype=self.dtype,
            )(x, train=train)
        if fused_pool:
            return jnp.max(x, axis=2)
        return x

    def _fused_pooled(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from tpugan_tpu.ops.pallas.pooled_mlp_kernel import (
            pooled_mlp_affine, pooled_mlp_bn_train)

        slope = act_slope(self.act)
        layers = [
            ConvLayer(f, act=self.act, norm=self.norm,
                      spectral_norm=self.spectral_norm,
                      use_bias=self.use_bias, dtype=self.dtype)
            for f in self.features
        ]
        ws, dbs = [], []
        cin = x.shape[-1]
        for f, layer in zip(self.features, layers):
            w, db = layer(jnp.zeros((1, cin), x.dtype), train=train,
                          fused_op="weights")
            ws.append(w)
            dbs.append(db)
            cin = f

        if self.norm == "none":
            ones = [jnp.ones((f,), jnp.float32) for f in self.features]
            bs = [db if db is not None else jnp.zeros((f,), jnp.float32)
                  for db, f in zip(dbs, self.features)]
            return pooled_mlp_affine(x, ws, ones, bs, slope)

        # batch norm: read gamma/beta (init defaults before creation), run
        # the multi-pass kernel, then let each real BatchNorm perform its
        # running-average update from the computed batch moments. A dense
        # bias under BN shifts only the stored running mean (the normalized
        # output is bias-invariant), so it is folded into mu for the update.
        params = self.variables.get("params", {})
        gs, bts = [], []
        for i, f in enumerate(self.features):
            bn = params.get(f"ConvLayer_{i}", {}).get("BatchNorm_0", None)
            if bn is None:
                gs.append(jnp.ones((f,), jnp.float32))
                bts.append(jnp.zeros((f,), jnp.float32))
            else:
                gs.append(bn["scale"])
                bts.append(bn["bias"])

        if train:
            pooled, mus, vars_ = pooled_mlp_bn_train(x, ws, gs, bts, slope)
            for layer, mu, var, db in zip(layers, mus, vars_, dbs):
                mu_upd = mu if db is None else mu + db
                layer(x, train=True, fused_op="bn_update",
                      bn_stats=(jax.lax.stop_gradient(mu_upd),
                                jax.lax.stop_gradient(var)))
            return pooled

        a_s, b_s = [], []
        for layer, g, bt, db in zip(layers, gs, bts, dbs):
            ra_mean, ra_var = layer(x, train=False, fused_op="bn_update")
            a = g * jax.lax.rsqrt(jnp.maximum(ra_var, 0.0) + 1e-5)
            b = bt - (ra_mean if db is None else ra_mean - db) * a
            a_s.append(a)
            b_s.append(b)
        return pooled_mlp_affine(x, ws, a_s, b_s, slope)


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
