"""Chamfer/EMD kernel timing harness.

Equivalent of the reference's only in-tree benchmark — the ``__main__``
block of train_fluid/analysis_helper.py:306-344: mean wall-time of the
Chamfer distance and the auction EMD over ``--reps`` repetitions on random
clouds of batch 8 x 79,872 points (EMD at eps=0.05). Timing uses the
chained-marginal methodology required on the tunneled TPU (see bench.py).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--points", type=int, default=79872)
    p.add_argument("--emd_points", type=int, default=79872,
                   help="EMD solve size; the reference harness config "
                        "(8 x 79,872) runs ~5 min with the scatter-free "
                        "auction (batch-sliced above n=32768)")
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--emd_iters", type=int, default=100)
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpugan_tpu.ops.metrics import chamfer, emd_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((opt.batch, opt.points, 3), np.float32))
    y = jnp.asarray(rng.random((opt.batch, opt.points, 3), np.float32))

    def marginal(step, x0, n_long, n_short=1):
        def run(n):
            a = x0
            t0 = time.perf_counter()
            for _ in range(n):
                a = step(a)
            _ = np.asarray(a).ravel()[:1]
            return time.perf_counter() - t0
        run(n_short)
        ts = min(run(n_short) for _ in range(2))
        tl = min(run(n_long) for _ in range(2))
        return (tl - ts) / (n_long - n_short)

    cd_step = jax.jit(lambda s: s + 1e-9 * jnp.sum(chamfer(x + s, y)))
    cd_t = marginal(cd_step, jnp.zeros(()), max(3, opt.reps))
    print(json.dumps({"metric": "chamfer_8x79872_ms", "value": round(cd_t * 1e3, 2)}))

    xe = x[:, : opt.emd_points]
    ye = y[:, : opt.emd_points]
    emd_step = jax.jit(
        lambda s: s + 1e-9 * jnp.sum(
            emd_loss(xe + s, ye, eps=0.05, iters=opt.emd_iters)
        )
    )
    emd_t = marginal(emd_step, jnp.zeros(()), 3)
    print(json.dumps({
        "metric": f"emd_{opt.batch}x{opt.emd_points}_iters{opt.emd_iters}_ms",
        "value": round(emd_t * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
