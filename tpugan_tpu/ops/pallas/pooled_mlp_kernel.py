"""Fused grouped SharedMLP(+BN)+max-pool for the set-abstraction towers.

The discriminator SA stages (reference discriminator.py:82-232, pointnet2
``QueryAndGroup`` + ``SharedMLP`` + max-pool) run a stack of pointwise
convs with batch norm over grouped tensors [B, M, ns, C] and max-pool the
neighborhood axis. The XLA formulation writes every per-layer grouped
intermediate [B, M, ns, H] to HBM (and, with batch norm, reads each twice
more for the moment reductions) — the dominant D-update traffic.

Here the whole stack runs per VMEM row tile and only the pooled
[B, M, C_out] result is written back. Batch norm needs global batch
moments, which no single pass can both produce and consume, so training
runs L+1 sequential Pallas passes over the SAME HBM-resident table:

    pass p (p = 0..L-1): recompute layers 0..p-1 with their (already
        known) BN affines folded in, then accumulate sum / sum-of-squares
        of layer p's pre-norm output across the whole grid  -> (mu_p, var_p)
    final pass: recompute all L layers with every affine folded, max-pool
        the neighborhood axis in VMEM, write [B, M, C_out].

The table is read L+1 times but NO intermediate ever reaches HBM; the
recompute matmuls are cheap (C <= 259) next to the saved traffic. Eval
(running-average BN) and norm-free stacks fold to a single pass.

BN math matches flax ``nn.BatchNorm``: biased variance E[z^2] - E[z]^2
accumulated in f32, y = act(z * a + b) with a = gamma * rsqrt(var + eps),
b = beta - mu * a.

Gradients: custom VJP recomputing through an identical-math XLA
formulation (same pattern as edgeconv_kernel.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_F32 = jnp.float32


def _act(x, slope: float):
    if slope == 0.0:
        return jnp.maximum(x, 0.0)
    return jnp.where(x >= 0, x, slope * x)


def _padded_lanes(c: int) -> int:
    return max(((c + 127) // 128) * 128, 128)


def _pick_tiles(m: int, ns: int, c_max: int) -> Optional[Tuple[int, int]]:
    """Row-tile sizes (TM over centers, TN over the neighborhood axis).

    TN must stay a sublane multiple so the [TM, TN, C] block can be
    collapsed to [TM*TN, C] rows in-kernel (Mosaic shape-cast rule; the
    neighborhood sizes in the towers are 16/32/64, group_all pools over
    the full cloud and tiles by 128/512).
    """
    if ns <= 512 and ns % 8 == 0:
        tn = ns
    elif ns % 512 == 0:
        tn = 512
    elif ns % 128 == 0:
        tn = 128
    else:
        return None
    budget = 3 * 1024 * 1024
    for tm in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if m % tm:
            continue
        if tm * tn * _padded_lanes(c_max) * 4 <= budget:
            return tm, tn
    return None


def _layers_body(x, ws, a_s, b_s, n, slope):
    """Fold n affine+act layers over flat rows x [R, C] entirely in VMEM."""
    for i in range(n):
        z = jnp.dot(x, ws[i], preferred_element_type=_F32)
        x = _act(z * a_s[i] + b_s[i], slope)
    return x


def _stats_kernel(tbl_ref, *refs, p, slope):
    """Accumulate sum / sumsq of layer p's pre-norm output over the grid."""
    ws = [refs[i][:] for i in range(p + 1)]
    a_s = [refs[p + 1 + i][0] for i in range(p)]
    b_s = [refs[2 * p + 1 + i][0] for i in range(p)]
    sum_ref, sq_ref = refs[-2], refs[-1]

    blk = tbl_ref[0]                                   # [TM, TN, C]
    tm, tn, c = blk.shape
    x = blk.reshape(tm * tn, c)
    x = _layers_body(x, ws, a_s, b_s, p, slope)
    z = jnp.dot(x, ws[p], preferred_element_type=_F32)
    s = jnp.sum(z, axis=0)[None]
    q = jnp.sum(z * z, axis=0)[None]

    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        sum_ref[...] = s
        sq_ref[...] = q

    @pl.when(jnp.logical_not(first))
    def _():
        sum_ref[...] += s
        sq_ref[...] += q


def _final_kernel(tbl_ref, *refs, n_layers, slope):
    """All layers + neighborhood max-pool; accumulates across TN tiles."""
    ws = [refs[i][:] for i in range(n_layers)]
    a_s = [refs[n_layers + i][0] for i in range(n_layers)]
    b_s = [refs[2 * n_layers + i][0] for i in range(n_layers)]
    out_ref = refs[-1]

    blk = tbl_ref[0]                                   # [TM, TN, C]
    tm, tn, c = blk.shape
    x = blk.reshape(tm * tn, c)
    x = _layers_body(x, ws, a_s, b_s, n_layers, slope)
    y = x.reshape(tm, tn, x.shape[-1])
    m = jnp.max(y, axis=1)                             # [TM, C_out]

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[0] = m

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[0] = jnp.maximum(out_ref[0], m)


def _run_stats_pass(table, ws, a_s, b_s, p, slope, tm, tn):
    b, m, ns, c = table.shape
    hp = ws[p].shape[-1]
    in_specs = [pl.BlockSpec((1, tm, tn, c),
                             lambda bi, mi, ni: (bi, mi, ni, 0))]
    ops = [table]
    for w in ws[: p + 1]:
        in_specs.append(pl.BlockSpec(w.shape, lambda bi, mi, ni: (0, 0)))
        ops.append(w)
    for v in list(a_s[:p]) + list(b_s[:p]):
        v2 = v[None]
        in_specs.append(pl.BlockSpec(v2.shape, lambda bi, mi, ni: (0, 0)))
        ops.append(v2)
    s, q = pl.pallas_call(
        functools.partial(_stats_kernel, p=p, slope=slope),
        grid=(b, m // tm, ns // tn),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, hp), lambda bi, mi, ni: (0, 0)),
            pl.BlockSpec((1, hp), lambda bi, mi, ni: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, hp), _F32),
            jax.ShapeDtypeStruct((1, hp), _F32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*ops)
    count = b * m * ns
    mu = s[0] / count
    var = q[0] / count - mu * mu
    return mu, var


def _run_final_pass(table, ws, a_s, b_s, slope, tm, tn):
    b, m, ns, c = table.shape
    n_layers = len(ws)
    out_dim = ws[-1].shape[-1]
    in_specs = [pl.BlockSpec((1, tm, tn, c),
                             lambda bi, mi, ni: (bi, mi, ni, 0))]
    ops = [table]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda bi, mi, ni: (0, 0)))
        ops.append(w)
    for v in list(a_s) + list(b_s):
        v2 = v[None]
        in_specs.append(pl.BlockSpec(v2.shape, lambda bi, mi, ni: (0, 0)))
        ops.append(v2)
    return pl.pallas_call(
        functools.partial(_final_kernel, n_layers=n_layers, slope=slope),
        grid=(b, m // tm, ns // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tm, out_dim),
                               lambda bi, mi, ni: (bi, mi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, out_dim), _F32),
        interpret=jax.default_backend() != "tpu",
    )(*ops)


# ---------------------------------------------------------------- reference


def _ref_affine(table, ws, a_s, b_s, slope):
    x = table.astype(_F32)
    for w, a, b in zip(ws, a_s, b_s):
        z = jnp.einsum("bmnc,ch->bmnh", x, w,
                       preferred_element_type=_F32)
        x = _act(z * a + b, slope)
    return jnp.max(x, axis=2)


def _ref_bn_train(table, ws, gammas, betas, slope, eps):
    x = table.astype(_F32)
    mus, vars_ = [], []
    for w, g, bt in zip(ws, gammas, betas):
        z = jnp.einsum("bmnc,ch->bmnh", x, w,
                       preferred_element_type=_F32)
        mu = jnp.mean(z, axis=(0, 1, 2))
        var = jnp.mean(z * z, axis=(0, 1, 2)) - mu * mu
        mus.append(mu)
        vars_.append(var)
        a = g * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        b = bt - mu * a
        x = _act(z * a + b, slope)
    return jnp.max(x, axis=2), tuple(mus), tuple(vars_)


# ------------------------------------------------------------- entry points


def _affine_impl(table, ws, a_s, b_s, slope):
    b, m, ns, c = table.shape
    c_max = max([c] + [w.shape[-1] for w in ws])
    tiles = _pick_tiles(m, ns, c_max)
    if tiles is None:
        return _ref_affine(table, ws, a_s, b_s, slope)
    tm, tn = tiles
    return _run_final_pass(table.astype(_F32), [w.astype(_F32) for w in ws],
                           [a.astype(_F32) for a in a_s],
                           [b_.astype(_F32) for b_ in b_s], slope, tm, tn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _affine_fused(table, ws, a_s, b_s, slope):
    return _affine_impl(table, ws, a_s, b_s, slope)


def _affine_vjp_fwd(table, ws, a_s, b_s, slope):
    return _affine_impl(table, ws, a_s, b_s, slope), (table, ws, a_s, b_s)


def _affine_vjp_bwd(slope, res, g):
    table, ws, a_s, b_s = res
    ref = functools.partial(_ref_affine, slope=slope)
    _, vjp = jax.vjp(ref, table, ws, a_s, b_s)
    return vjp(g)


_affine_fused.defvjp(_affine_vjp_fwd, _affine_vjp_bwd)


def _bn_train_impl(table, ws, gammas, betas, slope, eps):
    b, m, ns, c = table.shape
    c_max = max([c] + [w.shape[-1] for w in ws])
    tiles = _pick_tiles(m, ns, c_max)
    if tiles is None:
        return _ref_bn_train(table, ws, gammas, betas, slope, eps)
    tm, tn = tiles
    table = table.astype(_F32)
    ws = [w.astype(_F32) for w in ws]
    mus, vars_, a_s, b_s = [], [], [], []
    for p in range(len(ws)):
        mu, var = _run_stats_pass(table, ws, a_s, b_s, p, slope, tm, tn)
        a = gammas[p].astype(_F32) * jax.lax.rsqrt(
            jnp.maximum(var, 0.0) + eps)
        b_ = betas[p].astype(_F32) - mu * a
        mus.append(mu)
        vars_.append(var)
        a_s.append(a)
        b_s.append(b_)
    pooled = _run_final_pass(table, ws, a_s, b_s, slope, tm, tn)
    return pooled, tuple(mus), tuple(vars_)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _bn_train_fused(table, ws, gammas, betas, slope, eps):
    return _bn_train_impl(table, ws, gammas, betas, slope, eps)


def _bn_train_vjp_fwd(table, ws, gammas, betas, slope, eps):
    out = _bn_train_impl(table, ws, gammas, betas, slope, eps)
    return out, (table, ws, gammas, betas)


def _bn_train_vjp_bwd(slope, eps, res, g):
    table, ws, gammas, betas = res
    ref = functools.partial(_ref_bn_train, slope=slope, eps=eps)
    _, vjp = jax.vjp(ref, table, ws, gammas, betas)
    return vjp(g)


_bn_train_fused.defvjp(_bn_train_vjp_fwd, _bn_train_vjp_bwd)


def pooled_mlp_affine(
    table: jnp.ndarray,            # [B, M, ns, C] grouped features
    ws: Sequence[jnp.ndarray],     # per-layer [C_in, C_out] kernels
    a_s: Sequence[jnp.ndarray],    # per-layer [C_out] scale (BN-eval a, or 1)
    b_s: Sequence[jnp.ndarray],    # per-layer [C_out] shift (BN-eval b, bias)
    slope: float = 0.0,            # leaky-ReLU slope; 0 = ReLU
) -> jnp.ndarray:
    """act((x @ W_i) * a_i + b_i) stacked, then max over the ns axis."""
    return _affine_fused(table, tuple(ws), tuple(a_s), tuple(b_s), slope)


def pooled_mlp_bn_train(
    table: jnp.ndarray,            # [B, M, ns, C]
    ws: Sequence[jnp.ndarray],
    gammas: Sequence[jnp.ndarray],  # BN scale per layer
    betas: Sequence[jnp.ndarray],   # BN bias per layer
    slope: float = 0.0,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Train-mode BN stack + max-pool; also returns per-layer batch moments
    (mu, biased var) for the caller's running-average updates."""
    return _bn_train_fused(table, tuple(ws), tuple(gammas), tuple(betas),
                           slope, eps)
