"""Fluid sequence upsampling demo — the reference's
train_fluid/demo.ipynb as a script.

Loads (or synthesizes) a particle sequence, rolls the SRNet generator over
every frame with the 25-frame mask-history context, reports wall-clock, and
computes Chamfer/EMD metrics against the high-res ground truth when a
matching fine sequence exists. Equivalent flow: demo.ipynb cells 2-6
(SURVEY.md §3.3).

Usage:
    python examples/fluid_demo.py [--ckpt model_ckpt/] [--data_dir case1/]
"""

import argparse
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--data_dir", default=None,
                   help="dir of data_{i}.npz frames; synthetic if omitted")
    p.add_argument("--num_frames", type=int, default=24)
    p.add_argument("--use_vel", action="store_true")
    p.add_argument("--out_dir", default="./demo_out")
    opt = p.parse_args()

    import jax

    from tpugan_tpu.eval.analysis import position_metrics
    from tpugan_tpu.eval.rollout import rollout_sequence
    from tpugan_tpu.models import SRNet

    in_feats = 6 if opt.use_vel else 3
    model = SRNet(in_feats=in_feats, node_emb_dim=128, upsample_ratio=8)

    if opt.data_dir:
        frames = []
        names = sorted(f for f in os.listdir(opt.data_dir) if f.endswith(".npz"))
        for name in names[: opt.num_frames]:
            with np.load(os.path.join(opt.data_dir, name)) as z:
                frames.append((z["pos"], z.get("vel")))
    else:
        from tpugan_tpu.data.synthetic import synthetic_fluid_sequence

        frames = [
            (pos, vel)
            for pos, vel in synthetic_fluid_sequence(
                seed=7, num_particles=4096, num_frames=opt.num_frames
            )
        ]

    # low-res inputs: FPS /8 of each frame (what the trained model expects)
    from tpugan_tpu.data.sampling import farthest_point_sampling

    lowres = []
    for pos, vel in frames:
        idx, _ = farthest_point_sampling(pos, pos.shape[0] // 8, initial_idx=0)
        lowres.append((pos[idx], vel[idx] if vel is not None else None))

    pos0 = jax.numpy.asarray(lowres[0][0])[None]
    feat0 = pos0 if in_feats == 3 else jax.numpy.concatenate([pos0, pos0 * 0], -1)
    variables = jax.jit(lambda k, f, q: model.init(k, f, q, False))(
        jax.random.PRNGKey(0), feat0, pos0
    )
    if opt.ckpt:
        from flax import serialization

        path = opt.ckpt
        if os.path.isdir(path):
            with open(os.path.join(path, "latest_checkpoint.txt")) as fh:
                path = os.path.join(path, fh.readline().strip())
        with open(path, "rb") as fh:
            restored = serialization.msgpack_restore(fh.read())
        variables = {"params": serialization.from_state_dict(
            variables["params"], restored["sr_net"]["params"])}

    t0 = time.time()
    preds = rollout_sequence(model, variables, lowres, use_vel=opt.use_vel)
    print(f"Used: {time.time() - t0:.2f}s for {len(preds)} frames")

    os.makedirs(opt.out_dir, exist_ok=True)
    cds = []
    for i, pred in enumerate(preds):
        np.save(os.path.join(opt.out_dir, f"pred_{i}.npy"), pred)
        n = min(pred.shape[0], frames[i][0].shape[0])
        cd, _, _ = position_metrics(pred[None, :n], frames[i][0][None, :n],
                                    emd_iters=50)
        cds.append(cd)
    print(f"mean normalized Chamfer vs ground truth: {np.mean(cds):.6f}")


if __name__ == "__main__":
    main()
