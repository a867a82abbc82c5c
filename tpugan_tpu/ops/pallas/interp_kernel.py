"""Dense SPH-kernel scattered interpolation as one fused Pallas kernel.

out[q] = sum_c w(|q - c|) * values[c] / (sum_c w + 1e-6) over ALL
candidates within the cutoff radius.

Replaces the kNN + tiny-row-gather + segment-reduce chain for velocity
transfer (reference train_step_final.py:51-66 via
gcn_lib/interpolation.py:103-123): on TPU the FRNN/gather formulation is
DMA-descriptor-bound (12-byte gather rows; measured ~76 ms of a 170 ms
train step), while the dense form is two MXU matmuls per query tile —
the [TQ, M] pairwise-distance block and w @ values — with the kernel
weighting fused between them in VMEM. Nothing is gathered and no [N, M]
intermediate ever reaches HBM.

Semantics note: the reference's interpolation path caps at the K=32
nearest in-radius neighbors (an FRNN API artifact); its own eval-side
density oracle (train_fluid/analysis_helper.py:102-113) sums ALL
in-radius particles, which is what this kernel computes. The capped
variant remains in ops/interpolate.py for exact-parity use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 128
_VAL_PAD = 8   # pad C to sublane multiple; 128-lane padding would double VMEM


def _kernel_w(r2, cutoff, kind):
    """SPH kernel weight from squared distance (ops/interpolate.py
    formulas; reference gcn_lib/interpolation.py:83-100).

    The cubic spline is evaluated in the branchless two-hinge form
        W(q) = 2 (1-q)_+^3 - 8 (1/2-q)_+^3,   (x)_+ = max(x, 0)
    which is algebraically identical to the piecewise
    ``q<=1/2: 6(q^3-q^2)+1, else 2(1-q)^3`` and is simultaneously the
    radius mask: W vanishes exactly for q >= 1 (so candidates carrying the
    +BIG invalid-bias distance weigh 0 with no compare/select). This is
    the VPU hot loop of the dense interpolation kernel — one sqrt, no
    divide, no selects (~40% fewer scalar ops than the naive piecewise
    form; ROADMAP round-3 micro-op item).
    """
    inv_c2 = 1.0 / (float(cutoff) * float(cutoff))
    u = jnp.maximum(r2 * inv_c2, 0.0)      # q^2, clamped (matmul-d2 noise)
    q = jnp.sqrt(u)
    if kind in ("bicubic", "spline1"):
        coeff = (8.0 / (3.141592653589793 * cutoff ** 3)
                 if kind == "bicubic" else 1.0)
        s1 = jnp.maximum(1.0 - q, 0.0)
        s2 = jnp.maximum(0.5 - q, 0.0)
        return (2.0 * coeff) * (s1 * s1 * s1) - (8.0 * coeff) * (s2 * s2 * s2)
    if kind == "linear":
        return jnp.maximum(1.0 - q, 0.0)
    if kind == "exponential":
        coeff = 1.0 / (3.141592653589793 ** 1.5) * cutoff ** 3
        return jnp.where(u <= 1.0, coeff * jnp.exp(-u), 0.0)
    raise ValueError(f"unknown kernel {kind}")


def _interp_kernel(q_ref, c_ref, v_ref, val_ref, out_ref, den_ref,
                   *, cutoff, kind):
    # d2 on the VPU from a candidates-transposed [3, M] layout: a K=3 MXU
    # matmul runs at 3/128 lane utilization and measured ~2x the whole
    # kernel's useful work (BENCH_NOTES round 3); three lane-broadcast
    # difference-squares are both faster and cancellation-free.
    q = q_ref[0]                                   # [TQ, 3]
    dx = q[:, 0:1] - c_ref[0, 0:1, :]              # [TQ, M]
    dy = q[:, 1:2] - c_ref[0, 1:2, :]
    dz = q[:, 2:3] - c_ref[0, 2:3, :]
    d2 = dx * dx + dy * dy + dz * dz + v_ref[0, 0][None]
    w = _kernel_w(d2, cutoff, kind)                # invalid -> 0 via radius
    num = jax.lax.dot_general(
        w, val_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # [TQ, Cp]
    den = jnp.sum(w, axis=1) + 1e-6                # [TQ]
    out_ref[0] = num / den[:, None]
    den_ref[0] = den[:, None]


def kernel_interp_pallas(
    query: jnp.ndarray,        # [B, Nq, 3]
    cand: jnp.ndarray,         # [B, M, 3]
    values: jnp.ndarray,       # [B, M, C]
    cutoff: float,
    cvalid_bias: jnp.ndarray,  # [B, M] f32: 0 valid / BIG invalid
    kind: str = "bicubic",
    tile_q: int | None = None,
):
    """Dense all-in-radius kernel interpolation.

    Returns (out [B, Nq, C], den [B, Nq]) where den is the raw weight sum
    (callers can detect isolated queries via den ~ 1e-6).

    ``tile_q=None`` auto-picks the largest query tile whose [TQ, M]
    distance/weight planes stay inside the VMEM budget (fewer grid steps
    amortize per-step overhead; measured on chip, BENCH_NOTES round 3).
    """
    b, nq, d = query.shape
    m = cand.shape[1]
    c = values.shape[-1]
    cp = -(-c // _VAL_PAD) * _VAL_PAD
    if tile_q is None:
        # ~3 [TQ, M] f32 planes live at once; keep them under ~32 MB so the
        # candidate table + pipelining fit the 64 MB scoped budget
        tile_q = TILE_Q
        while tile_q < 512 and 3 * (2 * tile_q) * m * 4 <= 32 * 1024 * 1024:
            tile_q *= 2
    pad_q = (-nq) % tile_q
    qp = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0))) if pad_q else query
    nq_p = nq + pad_q
    vals = jnp.pad(values, ((0, 0), (0, 0), (0, cp - c))) if cp != c else values

    out, den = pl.pallas_call(
        functools.partial(_interp_kernel, cutoff=float(cutoff), kind=kind),
        grid=(b, nq_p // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, cp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, cp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq_p, cp), jnp.float32),
            jax.ShapeDtypeStruct((b, nq_p, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # d2 + w tiles at M ~ 10k exceed the 16M default scoped budget
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, jnp.swapaxes(cand, 1, 2), cvalid_bias[:, None, :], vals)
    return out[:, :nq, :c], den[:, :nq, 0]
