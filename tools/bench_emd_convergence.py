"""EMD convergence at the reference harness size (VERDICT r3 missing #5).

The reference's CUDA auction (loss.py:29-78) returns a full permutation;
round 3's single-phase TPU auction left ~450 duplicate assignments at the
8 x 79,872 harness size (analysis_helper.py:306-344 config), biasing EMD
low. This records the epsilon-scaled (+ exact Hungarian tail repair) solve:
unique-assignment count per item, EMD value, and wall time, vs the
single-phase approximate solve.

Usage: python tools/bench_emd_convergence.py [--batch 8] [--points 79872]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--points", type=int, default=79872)
    p.add_argument("--eps", type=float, default=0.05)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--phases", type=int, default=4)
    p.add_argument("--skip_single_phase", action="store_true")
    opt = p.parse_args()

    import jax.numpy as jnp

    from tpugan_tpu.ops.metrics import auction_assignment

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((opt.batch, opt.points, 3), np.float32))
    y = jnp.asarray(rng.random((opt.batch, opt.points, 3), np.float32))

    def run(phases):
        t0 = time.perf_counter()
        assign = np.asarray(auction_assignment(
            x, y, eps=opt.eps, iters=opt.iters, phases=phases))
        dt = time.perf_counter() - t0
        uniq = [int(np.unique(assign[i]).size) for i in range(opt.batch)]
        d = np.asarray(x) - np.asarray(y)[
            np.arange(opt.batch)[:, None], assign]
        emd = float(np.mean(np.linalg.norm(d, axis=-1)))
        print(json.dumps({
            "config": f"{opt.batch}x{opt.points} eps={opt.eps} "
                      f"iters={opt.iters} phases={phases}",
            "wall_s": round(dt, 2),
            "unique_mean": float(np.mean(uniq)),
            "unique_min": min(uniq),
            "n": opt.points,
            "full_permutation": bool(min(uniq) == opt.points),
            "emd_mean_dist": round(emd, 6),
        }), flush=True)

    if not opt.skip_single_phase:
        run(1)
    run(opt.phases)


if __name__ == "__main__":
    main()
