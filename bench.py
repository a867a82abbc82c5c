"""Headline benchmark: fluid-frame upsampling throughput on TPU.

Measures the flagship SRNet generator forward (hard-masked expansion — the
inference product of the reference, the 800-frame bunny rollout of
train_fluid/demo.ipynb cell 3) on >=10k-point fluid frames, per
BASELINE.json's north-star metric "fluid-frame upsampling frames/sec/chip".

Methodology: the tunneled TPU runtime acknowledges dispatches before
execution, so naive block_until_ready timing reads ~0 ms. We therefore
chain the forward (frame t's output feeds frame t+1) for two different
chain lengths and force a scalar device->host fetch; the marginal time
(t_long - t_short) / (n_long - n_short) is the true per-frame device time,
free of both per-call dispatch overhead and async under-counting.

Baseline note: the reference publishes no numbers (BASELINE.md "published:
{}"; its timing harness prints but never records). ``vs_baseline`` is
measured against REFERENCE_A100_FPS, an explicit estimate of the reference
PyTorch pipeline's single-A100 throughput at this size, derived from its
per-frame op inventory (~11 CUDA kNN/grouping rounds on 10k points + GCN
convs; PU-GCN-family implementations report 20-60 fps at 4x/10k points on
A100-class GPUs). Treat the ratio as indicative until a measured reference
number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_A100_FPS = 30.0  # documented estimate; see module docstring
N_POINTS = 10240           # >=10k-point frames (north star)
UPSAMPLE_RATIO = 8         # reference fluid setting (train_tempo.py r=8)
CHAIN_SHORT = 2
CHAIN_LONG = 12


def main() -> None:
    import os

    import jax

    os.makedirs(os.path.expanduser("~/.cache/tpugan_jax"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tpugan_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from tpugan_tpu.models import SRNet

    model = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=UPSAMPLE_RATIO)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(
        rng.standard_normal((1, N_POINTS, 3)).astype(np.float32) * 0.3
    )
    variables = jax.jit(lambda k, p: model.init(k, p, p, False))(
        jax.random.PRNGKey(0), pos
    )

    # chained step: the (slightly contracted) first N_POINTS output points
    # become the next frame's input, forcing serial execution
    step = jax.jit(
        lambda v, p: model.apply(v, p, p, False)[0][:, :N_POINTS] * 0.999
    )

    def run_chain(n: int) -> float:
        p = pos
        t0 = time.perf_counter()
        for _ in range(n):
            p = step(variables, p)
        _ = np.asarray(p[0, 0, 0])  # true sync: fetch forces execution
        return time.perf_counter() - t0

    run_chain(CHAIN_SHORT)  # warm: compile + first-fetch handshake
    t_short = min(run_chain(CHAIN_SHORT) for _ in range(2))
    t_long = min(run_chain(CHAIN_LONG) for _ in range(2))
    per_frame = max((t_long - t_short) / (CHAIN_LONG - CHAIN_SHORT), 1e-9)

    fps = 1.0 / per_frame
    print(json.dumps({
        "metric": f"srnet_{UPSAMPLE_RATIO}x_upsample_{N_POINTS}pt_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_A100_FPS, 2),
    }))


if __name__ == "__main__":
    main()
