"""Headline benchmark: 4x-class fluid-frame upsampling throughput on TPU.

Measures the flagship SRNet generator forward (hard-masked expansion, the
inference product of the reference — the 800-frame bunny rollout of
train_fluid/demo.ipynb cell 3) on >=10k-point fluid frames, per
BASELINE.json's north-star metric "fluid-frame upsampling frames/sec/chip".

Baseline note: the reference publishes no numbers (BASELINE.md: "published:
{}"; its timing harness prints but never records). ``vs_baseline`` is
therefore measured against REFERENCE_A100_FPS, an explicit estimate of the
reference PyTorch pipeline's single-A100 throughput at this size, derived
from its per-frame op inventory (per frame: ~40 CUDA kNN/ball-query/
grouping launches on 10k points + GCN convs; PU-GCN-family reference
implementations report 20-60 fps at 4x/10k on A100-class GPUs). Treat the
ratio as indicative until a measured reference number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_A100_FPS = 30.0  # documented estimate; see module docstring
N_POINTS = 10240           # >=10k-point frames (north star)
UPSAMPLE_RATIO = 8         # reference fluid setting (train_tempo.py r=8)
WARMUP = 3
REPS = 30


def main() -> None:
    import jax
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

    fwd = jax.jit(lambda v, p: model.apply(v, p, p, False))
    for _ in range(WARMUP):
        out = fwd(variables, pos)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fwd(variables, pos)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS

    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"srnet_{UPSAMPLE_RATIO}x_upsample_{N_POINTS}pt_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_A100_FPS, 2),
    }))


if __name__ == "__main__":
    main()
