"""Fused post-gather EdgeConv inner loop as one Pallas kernel.

Computes, for a pre-gathered neighbor table (the generator's norm-free,
bias-free EdgeConv; reference gcn_lib/pointnet/gcn.py:150-212):

    y_j  = lrelu(nbr_j @ Wn) + lrelu((nbr_j - center) @ We)   # two affines
    y_j  = lrelu(y_j @ W1); y_j = lrelu(y_j @ W2)             # SharedMLP
    out  = aggregate_j(y_j)                                    # max/sum/...

entirely in VMEM per row tile. The XLA formulation materializes every
grouped [N, k, C'] intermediate in HBM and surrounds each matmul with
layout-fixup copies (measured ~2.2 ms of pure relayout copies per
10240-point SRNet forward); here the gathered table is read from HBM
exactly once and only the aggregated [N, C_out] result is written back.

Layout: the neighbor table is NEIGHBOR-MAJOR [B, K, N, C] (neighbor j of
all N points is one contiguous plane). Mosaic cannot shape-cast a flat
[T*K, C] tile into [T, K, C] (K=20 is not a sublane multiple), but static
per-plane indexing ``nbr_ref[0, j]`` is free — the kernel statically
unrolls the K planes and folds the aggregation. Callers produce this
order directly by gathering with transposed indices (same gather cost).

The neighbor gather itself stays in XLA (Mosaic has no cross-vreg vector
gather: ``tpu.dynamic_gather`` requires the table to fit one vreg along
the gathered dimension), so the kernel consumes the gather's output.

Gradients: ``edgeconv_fused`` carries a custom VJP whose backward
recomputes through the identical-math XLA formulation — safe under
``jax.grad``; inference paths use it by default (EdgeConv auto-enables at
train=False).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _fold(acc, y, mode):
    if mode == "max":
        return jnp.maximum(acc, y)
    if mode == "min":
        return jnp.minimum(acc, y)
    if mode in ("sum", "mean"):
        return acc + y
    raise ValueError(mode)


def _edgeconv_kernel(nbr_ref, ctr_ref, wn_ref, we_ref, w1_ref, w2_ref,
                     out_ref, *, k, aggregate, mlp, cdt):
    f32 = jnp.float32
    ctr = ctr_ref[0]                          # [T, C]
    wn = wn_ref[:].astype(cdt)
    we = we_ref[:].astype(cdt)
    if mlp:
        w1 = w1_ref[:].astype(cdt)
        w2 = w2_ref[:].astype(cdt)
    acc = None
    for j in range(k):                        # static unroll over planes
        nb = nbr_ref[0, j]                    # [T, C]
        y = (_lrelu(jnp.dot(nb, wn, preferred_element_type=f32))
             + _lrelu(jnp.dot(nb - ctr, we, preferred_element_type=f32))
             ).astype(cdt)
        if mlp:
            y = _lrelu(jnp.dot(y, w1, preferred_element_type=f32)).astype(cdt)
            y = _lrelu(jnp.dot(y, w2, preferred_element_type=f32)).astype(cdt)
        acc = y if acc is None else _fold(acc, y, aggregate)
    if aggregate == "mean":
        acc = acc / jnp.asarray(k, acc.dtype)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_tile(n: int, k: int, c_max: int) -> int:
    # keep the [K, T, C] block + live tiles comfortably inside VMEM
    for t in (512, 256, 128, 64, 32, 16, 8):
        if k * t * c_max * 2 <= 4 * 1024 * 1024 and n % t == 0:
            return t
    return 0


def _reference_impl(nbr_t, ctr, wn, we, w1, w2, *, aggregate, cdt):
    """Plain-XLA forward with identical math (backward / fallback path).

    nbr_t: [B, K, N, C] neighbor-major; ctr: [B, N, C].
    """
    nbr_t = nbr_t.astype(cdt)
    ctr = ctr.astype(cdt)
    f32 = jnp.float32
    edge = nbr_t - ctr[:, None, :, :]
    y = (_lrelu(jnp.einsum("bknc,ch->bknh", nbr_t, wn.astype(cdt),
                           preferred_element_type=f32))
         + _lrelu(jnp.einsum("bknc,ch->bknh", edge, we.astype(cdt),
                             preferred_element_type=f32))).astype(cdt)
    if w1 is not None:
        y = _lrelu(jnp.einsum("bknh,hg->bkng", y, w1.astype(cdt),
                              preferred_element_type=f32)).astype(cdt)
        y = _lrelu(jnp.einsum("bkng,go->bkno", y, w2.astype(cdt),
                              preferred_element_type=f32)).astype(cdt)
    if aggregate == "max":
        return jnp.max(y, axis=1)
    if aggregate == "min":
        return jnp.min(y, axis=1)
    if aggregate == "sum":
        return jnp.sum(y, axis=1)
    if aggregate == "mean":
        return jnp.mean(y, axis=1)
    raise ValueError(aggregate)


def _fwd_pallas(nbr_t, ctr, wn, we, w1, w2, *, aggregate, cdt):
    b, k, n, c = nbr_t.shape
    mlp = w1 is not None
    h = wn.shape[-1]
    out_dim = w2.shape[-1] if mlp else h
    t = _pick_tile(n, k, max(c, h, out_dim))
    if t == 0:
        return _reference_impl(nbr_t, ctr, wn, we, w1, w2,
                               aggregate=aggregate, cdt=cdt)
    # MLP weights are required pallas operands; no-MLP variants pass the
    # edge affine again as a placeholder (unread: mlp=False skips the dots).
    w1p = w1 if mlp else we
    w2p = w2 if mlp else we
    kern = functools.partial(_edgeconv_kernel, k=k, aggregate=aggregate,
                             mlp=mlp, cdt=cdt)
    return pl.pallas_call(
        kern,
        grid=(b, n // t),
        in_specs=[
            pl.BlockSpec((1, k, t, c), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((1, t, c), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec(wn.shape, lambda bi, i: (0, 0)),
            pl.BlockSpec(we.shape, lambda bi, i: (0, 0)),
            pl.BlockSpec(w1p.shape, lambda bi, i: (0, 0)),
            pl.BlockSpec(w2p.shape, lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, out_dim), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, out_dim), cdt),
        interpret=jax.default_backend() != "tpu",
    )(nbr_t.astype(cdt), ctr.astype(cdt), wn, we, w1p, w2p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _edgeconv_fused(nbr_t, ctr, wn, we, w1, w2, aggregate, cdt):
    return _fwd_pallas(nbr_t, ctr, wn, we, w1, w2, aggregate=aggregate,
                       cdt=cdt)


def _vjp_fwd(nbr_t, ctr, wn, we, w1, w2, aggregate, cdt):
    out = _fwd_pallas(nbr_t, ctr, wn, we, w1, w2, aggregate=aggregate,
                      cdt=cdt)
    return out, (nbr_t, ctr, wn, we, w1, w2)


def _vjp_bwd(aggregate, cdt, res, g):
    nbr_t, ctr, wn, we, w1, w2 = res
    ref = functools.partial(_reference_impl, aggregate=aggregate, cdt=cdt)
    _, vjp = jax.vjp(ref, nbr_t, ctr, wn, we, w1, w2)
    return vjp(g)


_edgeconv_fused.defvjp(_vjp_fwd, _vjp_bwd)


def edgeconv_fused(
    nbr_t: jnp.ndarray,               # [B, K, N, C] neighbor-major table
    ctr: jnp.ndarray,                 # [B, N, C] center features
    wn: jnp.ndarray,                  # [C, H] node affine
    we: jnp.ndarray,                  # [C, H] edge affine
    w1: Optional[jnp.ndarray] = None,  # [H, H] SharedMLP layer 1
    w2: Optional[jnp.ndarray] = None,  # [H, C_out] SharedMLP layer 2
    aggregate: str = "max",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused EdgeConv tail on a neighbor-major table -> [B, N, C_out].

    Bias-free, norm-free (the generator configuration; layers.py bias
    quirk). ``w1``/``w2`` = None skips the SharedMLP (mlp_layer=False).
    """
    return _edgeconv_fused(nbr_t, ctr, wn, we, w1, w2, aggregate,
                           compute_dtype)
