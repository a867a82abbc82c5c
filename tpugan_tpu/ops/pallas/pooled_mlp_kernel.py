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

Gradients: a dedicated multi-pass Pallas backward (same recompute-in-VMEM
structure as the forward). For the BN stack the per-layer global gradient
moments S1_p = sum(dpre_p), S2_p = sum(dpre_p * zhat_p) — which are exactly
dbeta_p / dgamma_p — are accumulated by L top-down reduction passes, then
one apply pass writes dtable and accumulates every dW across the grid.
Max-pool gradients reproduce XLA's tie-splitting rule via the saved pooled
output and a tie-count pass. Falls back to an identical-math XLA recompute
VJP for untileable shapes. The (mus, vars) side outputs are running-stat
values and are non-differentiable BY CONTRACT (stop_gradient applied in
``pooled_mlp_bn_train``); the in-tree consumer (nn/layers.py) already
stop-gradients them for its BatchNorm running-average probe.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------------------------------------------------- Pallas backward


def _actp(pre, slope: float):
    return jnp.where(pre >= 0, 1.0, slope)


def _pick_tiles_bwd(m: int, ns: int, widths) -> Optional[Tuple[int, int]]:
    """Backward tiles: every per-layer activation (xs/zs/pres) stays live
    per tile for the dW products, plus two gradient temporaries."""
    live = 3 * sum(_padded_lanes(w) for w in widths) \
        + 2 * _padded_lanes(max(widths))
    if ns <= 512 and ns % 8 == 0:
        tn = ns
    elif ns % 512 == 0:
        tn = 512
    elif ns % 128 == 0:
        tn = 128
    else:
        return None
    budget = 8 * 1024 * 1024
    for tm in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if m % tm:
            continue
        if tm * tn * live * 4 <= budget:
            return tm, tn
    return None


def _recompute_fwd(blk, ws, a_s, b_s, slope):
    """xs[q] = flat-row input of layer q, plus every z / pre-activation."""
    tm, tn, c = blk.shape
    x = blk.reshape(tm * tn, c)
    xs, zs, pres = [x], [], []
    for w, a, b in zip(ws, a_s, b_s):
        z = jnp.dot(xs[-1], w, preferred_element_type=_F32)
        pre = z * a + b
        zs.append(z)
        pres.append(pre)
        xs.append(_act(pre, slope))
    return xs, zs, pres


def _pool_grad(y_flat, g_ref, pooled_ref, cnt_ref, tm, tn):
    """Distribute the pooled-max cotangent (XLA tie-splitting rule)."""
    h = y_flat.shape[-1]
    y = y_flat.reshape(tm, tn, h)
    mask = (y == pooled_ref[0][:, None, :]).astype(_F32)
    dy = mask * (g_ref[0] / cnt_ref[0])[:, None, :]
    return dy.reshape(tm * tn, h)


def _walk_down(dy, xs, zs, pres, ws, a_s, slope, bn, mus, ivars,
               s1s, s2s, n_inv, stop):
    """Backward chain from the pool cotangent. stop >= 0: return dpre at
    layer ``stop`` (its S-moments are what the caller is reducing).
    stop == -1: return (dzs, dpres, dx0) for the apply pass."""
    n_layers = len(ws)
    dx = dy
    dzs = [None] * n_layers
    dpres = [None] * n_layers
    for q in range(n_layers - 1, -1, -1):
        dpre = dx * _actp(pres[q], slope)
        if q == stop:
            return dpre
        dpres[q] = dpre
        if bn:
            zhat = (zs[q] - mus[q]) * ivars[q]
            dz = a_s[q] * (dpre - s1s[q] * n_inv - zhat * (s2s[q] * n_inv))
        else:
            dz = dpre * a_s[q]
        dzs[q] = dz
        dx = jax.lax.dot_general(
            dz, ws[q], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_F32)
    return dzs, dpres, dx


def _tie_count_kernel(tbl_ref, pooled_ref, *refs, n_layers, slope):
    ws = [refs[i][:] for i in range(n_layers)]
    a_s = [refs[n_layers + i][0] for i in range(n_layers)]
    b_s = [refs[2 * n_layers + i][0] for i in range(n_layers)]
    cnt_ref = refs[-1]
    blk = tbl_ref[0]
    tm, tn, _ = blk.shape
    xs, _, _ = _recompute_fwd(blk, ws, a_s, b_s, slope)
    y = xs[-1].reshape(tm, tn, xs[-1].shape[-1])
    ties = jnp.sum((y == pooled_ref[0][:, None, :]).astype(_F32), axis=1)

    @pl.when(pl.program_id(2) == 0)
    def _():
        cnt_ref[0] = ties

    @pl.when(pl.program_id(2) != 0)
    def _():
        cnt_ref[0] += ties


def _bwd_stats_kernel(tbl_ref, g_ref, pooled_ref, cnt_ref, *refs,
                      n_layers, p, slope, n_inv):
    l = n_layers
    ws = [refs[i][:] for i in range(l)]
    a_s = [refs[l + i][0] for i in range(l)]
    b_s = [refs[2 * l + i][0] for i in range(l)]
    mus = [refs[3 * l + i][0] for i in range(l)]
    ivars = [refs[4 * l + i][0] for i in range(l)]
    s1s = [refs[5 * l + i][0] for i in range(l)]
    s2s = [refs[6 * l + i][0] for i in range(l)]
    s1_ref, s2_ref = refs[-2], refs[-1]

    blk = tbl_ref[0]
    tm, tn, _ = blk.shape
    xs, zs, pres = _recompute_fwd(blk, ws, a_s, b_s, slope)
    dy = _pool_grad(xs[-1], g_ref, pooled_ref, cnt_ref, tm, tn)
    dpre = _walk_down(dy, xs, zs, pres, ws, a_s, slope, True, mus, ivars,
                      s1s, s2s, n_inv, stop=p)
    zhat = (zs[p] - mus[p]) * ivars[p]
    s1 = jnp.sum(dpre, axis=0)[None]
    s2 = jnp.sum(dpre * zhat, axis=0)[None]

    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(jnp.logical_not(first))
    def _():
        s1_ref[...] += s1
        s2_ref[...] += s2


def _bwd_apply_kernel(tbl_ref, g_ref, pooled_ref, cnt_ref, *refs,
                      n_layers, slope, bn, n_inv):
    l = n_layers
    ws = [refs[i][:] for i in range(l)]
    a_s = [refs[l + i][0] for i in range(l)]
    b_s = [refs[2 * l + i][0] for i in range(l)]
    if bn:
        mus = [refs[3 * l + i][0] for i in range(l)]
        ivars = [refs[4 * l + i][0] for i in range(l)]
        s1s = [refs[5 * l + i][0] for i in range(l)]
        s2s = [refs[6 * l + i][0] for i in range(l)]
        outs = refs[7 * l:]
        dtbl_ref, dw_refs = outs[0], outs[1:1 + l]
        da_refs = db_refs = None
    else:
        mus = ivars = s1s = s2s = None
        outs = refs[3 * l:]
        dtbl_ref, dw_refs = outs[0], outs[1:1 + l]
        da_refs, db_refs = outs[1 + l:1 + 2 * l], outs[1 + 2 * l:]

    blk = tbl_ref[0]
    tm, tn, c = blk.shape
    xs, zs, pres = _recompute_fwd(blk, ws, a_s, b_s, slope)
    dy = _pool_grad(xs[-1], g_ref, pooled_ref, cnt_ref, tm, tn)
    dzs, dpres, dx0 = _walk_down(dy, xs, zs, pres, ws, a_s, slope, bn,
                                 mus, ivars, s1s, s2s, n_inv, stop=-1)
    dtbl_ref[0] = dx0.reshape(tm, tn, c)

    dws = [jax.lax.dot_general(
        xs[q], dzs[q], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32) for q in range(l)]
    if not bn:
        das = [jnp.sum(dpres[q] * zs[q], axis=0)[None] for q in range(l)]
        dbs = [jnp.sum(dpres[q], axis=0)[None] for q in range(l)]

    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        for q in range(l):
            dw_refs[q][...] = dws[q]
            if not bn:
                da_refs[q][...] = das[q]
                db_refs[q][...] = dbs[q]

    @pl.when(jnp.logical_not(first))
    def _():
        for q in range(l):
            dw_refs[q][...] += dws[q]
            if not bn:
                da_refs[q][...] += das[q]
                db_refs[q][...] += dbs[q]


def _whole_spec(shape):
    return pl.BlockSpec(shape, lambda bi, mi, ni: (0,) * len(shape))


def _vec_ops_specs(vecs):
    ops, specs = [], []
    for v in vecs:
        v2 = v[None]
        ops.append(v2)
        specs.append(_whole_spec(v2.shape))
    return ops, specs


def _bwd_common_specs(table, pooled, g, cnt, tm, tn):
    b, m, ns, c = table.shape
    cout = pooled.shape[-1]
    tbl_spec = pl.BlockSpec((1, tm, tn, c), lambda bi, mi, ni: (bi, mi, ni, 0))
    row_spec = pl.BlockSpec((1, tm, cout), lambda bi, mi, ni: (bi, mi, 0))
    return tbl_spec, row_spec


def _run_tie_pass(table, ws, a_s, b_s, pooled, slope, tm, tn):
    b, m, ns, c = table.shape
    cout = ws[-1].shape[-1]
    tbl_spec, row_spec = _bwd_common_specs(table, pooled, None, None, tm, tn)
    vec_ops, vec_specs = _vec_ops_specs(list(a_s) + list(b_s))
    return pl.pallas_call(
        functools.partial(_tie_count_kernel, n_layers=len(ws), slope=slope),
        grid=(b, m // tm, ns // tn),
        in_specs=[tbl_spec, row_spec]
        + [_whole_spec(w.shape) for w in ws] + vec_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, m, cout), _F32),
        interpret=jax.default_backend() != "tpu",
    )(table, pooled, *ws, *vec_ops)


def _run_bwd_stats_pass(table, g, pooled, cnt, ws, a_s, b_s, mus, ivars,
                        s1s, s2s, p, slope, n_inv, tm, tn):
    b, m, ns, c = table.shape
    hp = ws[p].shape[-1]
    tbl_spec, row_spec = _bwd_common_specs(table, pooled, g, cnt, tm, tn)
    vec_ops, vec_specs = _vec_ops_specs(
        list(a_s) + list(b_s) + list(mus) + list(ivars)
        + list(s1s) + list(s2s))
    return pl.pallas_call(
        functools.partial(_bwd_stats_kernel, n_layers=len(ws), p=p,
                          slope=slope, n_inv=n_inv),
        grid=(b, m // tm, ns // tn),
        in_specs=[tbl_spec, row_spec, row_spec, row_spec]
        + [_whole_spec(w.shape) for w in ws] + vec_specs,
        out_specs=[_whole_spec((1, hp)), _whole_spec((1, hp))],
        out_shape=[jax.ShapeDtypeStruct((1, hp), _F32),
                   jax.ShapeDtypeStruct((1, hp), _F32)],
        interpret=jax.default_backend() != "tpu",
    )(table, g, pooled, cnt, *ws, *vec_ops)


def _run_bwd_apply_pass(table, g, pooled, cnt, ws, a_s, b_s, mus, ivars,
                        s1s, s2s, slope, bn, n_inv, tm, tn):
    b, m, ns, c = table.shape
    tbl_spec, row_spec = _bwd_common_specs(table, pooled, g, cnt, tm, tn)
    vecs = list(a_s) + list(b_s)
    if bn:
        vecs += list(mus) + list(ivars) + list(s1s) + list(s2s)
    vec_ops, vec_specs = _vec_ops_specs(vecs)
    out_specs = [tbl_spec] + [_whole_spec(w.shape) for w in ws]
    out_shape = [jax.ShapeDtypeStruct(table.shape, _F32)] \
        + [jax.ShapeDtypeStruct(w.shape, _F32) for w in ws]
    if not bn:
        for w in ws:
            out_specs.append(_whole_spec((1, w.shape[-1])))
            out_shape.append(jax.ShapeDtypeStruct((1, w.shape[-1]), _F32))
        for w in ws:
            out_specs.append(_whole_spec((1, w.shape[-1])))
            out_shape.append(jax.ShapeDtypeStruct((1, w.shape[-1]), _F32))
    return pl.pallas_call(
        functools.partial(_bwd_apply_kernel, n_layers=len(ws), slope=slope,
                          bn=bn, n_inv=n_inv),
        grid=(b, m // tm, ns // tn),
        in_specs=[tbl_spec, row_spec, row_spec, row_spec]
        + [_whole_spec(w.shape) for w in ws] + vec_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(table, g, pooled, cnt, *ws, *vec_ops)


def _bwd_tiles(table, ws):
    b, m, ns, c = table.shape
    widths = [c] + [w.shape[-1] for w in ws]
    # gate on the forward picker too: the backward only applies when the
    # forward actually took the Pallas path (tie masks must recompute the
    # same op sequence bitwise)
    if _pick_tiles(m, ns, max(widths)) is None:
        return None
    return _pick_tiles_bwd(m, ns, widths)


def _bwd_pallas_affine(table, ws, a_s, b_s, slope, pooled, g):
    tiles = _bwd_tiles(table, ws)
    if tiles is None:
        return None
    tm, tn = tiles
    table = table.astype(_F32)
    ws = [w.astype(_F32) for w in ws]
    a_s = [a.astype(_F32) for a in a_s]
    b_s = [x.astype(_F32) for x in b_s]
    cnt = _run_tie_pass(table, ws, a_s, b_s, pooled, slope, tm, tn)
    outs = _run_bwd_apply_pass(table, g.astype(_F32), pooled, cnt, ws, a_s,
                               b_s, None, None, None, None, slope, False,
                               0.0, tm, tn)
    l = len(ws)
    dtable, dws = outs[0], outs[1:1 + l]
    das = [v[0] for v in outs[1 + l:1 + 2 * l]]
    dbs = [v[0] for v in outs[1 + 2 * l:]]
    return dtable, tuple(dws), tuple(das), tuple(dbs)


def _bwd_pallas_bn(table, ws, gammas, betas, mus, vars_, slope, eps,
                   pooled, g):
    tiles = _bwd_tiles(table, ws)
    if tiles is None:
        return None
    tm, tn = tiles
    b, m, ns, _ = table.shape
    n_inv = 1.0 / float(b * m * ns)
    table = table.astype(_F32)
    ws = [w.astype(_F32) for w in ws]
    l = len(ws)
    ivars, a_s, b_s = [], [], []
    for p in range(l):
        iv = jax.lax.rsqrt(jnp.maximum(vars_[p], 0.0) + eps)
        a = gammas[p].astype(_F32) * iv
        ivars.append(iv)
        a_s.append(a)
        b_s.append(betas[p].astype(_F32) - mus[p] * a)
    cnt = _run_tie_pass(table, ws, a_s, b_s, pooled, slope, tm, tn)
    g = g.astype(_F32)
    s1s = [jnp.zeros((w.shape[-1],), _F32) for w in ws]
    s2s = [jnp.zeros((w.shape[-1],), _F32) for w in ws]
    for p in range(l - 1, -1, -1):
        s1, s2 = _run_bwd_stats_pass(table, g, pooled, cnt, ws, a_s, b_s,
                                     mus, ivars, s1s, s2s, p, slope, n_inv,
                                     tm, tn)
        s1s[p] = s1[0]
        s2s[p] = s2[0]
    outs = _run_bwd_apply_pass(table, g, pooled, cnt, ws, a_s, b_s, mus,
                               ivars, s1s, s2s, slope, True, n_inv, tm, tn)
    dtable, dws = outs[0], outs[1:]
    # dgamma = sum(dpre * zhat) = S2; dbeta = sum(dpre) = S1
    return dtable, tuple(dws), tuple(s2s), tuple(s1s)


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
    out = _affine_impl(table, ws, a_s, b_s, slope)
    return out, (table, ws, a_s, b_s, out)


def _affine_vjp_bwd(slope, res, g):
    table, ws, a_s, b_s, pooled = res
    got = _bwd_pallas_affine(table, ws, a_s, b_s, slope, pooled, g)
    if got is not None:
        dtable, dws, das, dbs = got
        return (dtable.astype(table.dtype),
                tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws)),
                tuple(da.astype(a.dtype) for da, a in zip(das, a_s)),
                tuple(db.astype(b.dtype) for db, b in zip(dbs, b_s)))
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
    pooled, mus, vars_ = out
    return out, (table, ws, gammas, betas, mus, vars_, pooled)


def _bn_train_vjp_bwd(slope, eps, res, g):
    # The (mus, vars) side outputs are non-differentiable by contract
    # (stop_gradient applied in pooled_mlp_bn_train), so only the pooled
    # cotangent g[0] carries signal.
    table, ws, gammas, betas, mus, vars_, pooled = res
    gp = g[0]
    got = _bwd_pallas_bn(table, ws, gammas, betas, mus, vars_, slope, eps,
                         pooled, gp)
    if got is not None:
        dtable, dws, dgammas, dbetas = got
        return (dtable.astype(table.dtype),
                tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws)),
                tuple(dg.astype(ga.dtype) for dg, ga in zip(dgammas, gammas)),
                tuple(db.astype(be.dtype) for db, be in zip(dbetas, betas)))

    def ref_pooled(t, w, ga, be):
        p, _, _ = _ref_bn_train(t, w, ga, be, slope, eps)
        return p

    _, vjp = jax.vjp(ref_pooled, table, ws, gammas, betas)
    return vjp(gp)


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
    (mu, biased var) for the caller's running-average updates. The moments
    are running-stat VALUES — non-differentiable by contract (gradients
    flow through the moments *inside* the pooled output's BN backward, but
    the returned copies are stop_gradient'd)."""
    pooled, mus, vars_ = _bn_train_fused(
        table, tuple(ws), tuple(gammas), tuple(betas), slope, eps)
    sg = jax.lax.stop_gradient
    return (pooled, tuple(sg(m) for m in mus), tuple(sg(v) for v in vars_))
