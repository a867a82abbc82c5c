"""Sequence rollout CLI — the demo.ipynb cell-3 loop as a proper entry
point (reference train_fluid/demo.ipynb; SURVEY.md §3.3).

Reads ``data_{i}.npz`` frames (pos, vel) from a directory (or generates a
synthetic sequence), upsamples every frame with the 25-frame mask-history
context, reports wall-clock frames/sec, and writes .npy (and optionally
.bgeo) outputs.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np



def _enable_compile_cache():
    import jax

    os.makedirs(os.path.expanduser("~/.cache/tpugan_jax"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tpugan_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    _enable_compile_cache()
    p = argparse.ArgumentParser(description="TPU-GAN sequence rollout")
    p.add_argument("--data_dir", type=str, default=None,
                   help="directory with data_{i}.npz frames")
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint file/dir (random init if omitted)")
    p.add_argument("--out_dir", type=str, default="./rollout_out")
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--use_vel", action="store_true")
    p.add_argument("--in_node_feats", type=int, default=3)
    p.add_argument("--node_embedding", type=int, default=128)
    p.add_argument("--upsample_ratio", type=int, default=8)
    p.add_argument("--export_bgeo", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_particles", type=int, default=4096)
    p.add_argument("--compute_dtype", choices=["f32", "bf16"], default="f32",
                   help="bf16 runs the generator's inner convs/gathers in "
                        "bfloat16 (f32 params and outputs)")
    p.add_argument("--graph_mode", choices=["dynamic", "static"],
                   default="dynamic",
                   help="static reuses ONE k=20 input-space kNN graph in "
                        "every layer (serving approximation)")
    p.add_argument("--host_pipeline", action="store_true",
                   help="force the per-frame host loop; by default "
                        "uniform-size sequences run the chunked "
                        "device-resident lax.scan rollout")
    p.add_argument("--chunk", type=int, default=100,
                   help="frames per device chunk in the scan rollout")
    p.add_argument("--shard_points", action="store_true",
                   help="shard each frame's POINT axis over the device mesh "
                        "(big single frames: graph builds all-gather over "
                        "ICI, everything else stays local; exact results)")
    p.add_argument("--mesh_devices", type=int, default=None,
                   help="devices in the point-sharding mesh (default: all)")
    opt = p.parse_args()

    import jax.numpy as jnp

    from tpugan_tpu.models import SRNet
    from tpugan_tpu.eval.rollout import rollout_sequence, rollout_sequence_device

    model = SRNet(
        in_feats=opt.in_node_feats, node_emb_dim=opt.node_embedding,
        upsample_ratio=opt.upsample_ratio,
        compute_dtype=jnp.bfloat16 if opt.compute_dtype == "bf16" else None,
        graph_mode=opt.graph_mode,
    )

    # ---- frames
    if opt.synthetic or opt.data_dir is None:
        from tpugan_tpu.data.synthetic import synthetic_fluid_sequence

        n_frames = opt.num_frames or 24
        frames = [
            (pos, vel) for pos, vel in synthetic_fluid_sequence(
                seed=3, num_particles=opt.synthetic_particles,
                num_frames=n_frames,
            )
        ]
    else:
        names = sorted(
            (f for f in os.listdir(opt.data_dir) if f.endswith(".npz")),
            key=lambda s: int("".join(c for c in s if c.isdigit()) or 0),
        )
        if opt.num_frames:
            names = names[: opt.num_frames]
        frames = []
        for name in names:
            with np.load(os.path.join(opt.data_dir, name)) as z:
                frames.append((z["pos"], z.get("vel")))

    # ---- model variables
    pos0 = jax.numpy.asarray(frames[0][0], jax.numpy.float32)[None]
    feat0 = pos0
    if opt.in_node_feats == 6:
        feat0 = jax.numpy.concatenate([pos0, pos0 * 0], axis=-1)
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
            import flax

            restored = serialization.msgpack_restore(fh.read())
        variables = {
            "params": serialization.from_state_dict(
                variables["params"], restored["sr_net"]["params"]
            )
        }
        print(f"restored generator from {path}")

    # ---- rollout
    os.makedirs(opt.out_dir, exist_ok=True)
    uniform = len({p.shape[0] for p, _ in frames}) == 1
    t0 = time.time()
    if opt.shard_points:
        if not uniform:
            raise SystemExit("--shard_points needs a uniform-N sequence")
        from tpugan_tpu.parallel.mesh import make_mesh
        from tpugan_tpu.parallel.sharded_serving import (
            rollout_sequence_sharded,
        )

        mesh = make_mesh(opt.mesh_devices)
        print(f"point-sharding frames over {mesh.devices.size} devices")
        pos_seq = np.stack([p for p, _ in frames])
        vel_seq = (np.stack([v for _, v in frames])
                   if frames[0][1] is not None else None)
        outputs = rollout_sequence_sharded(
            model, variables, pos_seq, vel_seq, mesh=mesh,
            use_vel=opt.use_vel,
        )
    elif uniform and not opt.host_pipeline:
        pos_seq = np.stack([p for p, _ in frames])
        vel_seq = (np.stack([v for _, v in frames])
                   if frames[0][1] is not None else None)
        outputs = rollout_sequence_device(
            model, variables, pos_seq, vel_seq, use_vel=opt.use_vel,
            chunk=min(opt.chunk, len(frames)),
        )
    else:
        outputs = rollout_sequence(
            model, variables, frames, use_vel=opt.use_vel
        )
    used = time.time() - t0
    print(f"Used: {used:.2f}s for {len(frames)} frames "
          f"({len(frames)/used:.2f} frames/s)")

    # write outputs off the timed path on a background thread (the save is
    # disk-bound; the single-core host otherwise serializes it)
    import threading

    def _write(i, pts):
        np.save(os.path.join(opt.out_dir, f"pred_{i}.npy"), pts)
        if opt.export_bgeo:
            from tpugan_tpu.data.bgeo import write_bgeo

            write_bgeo(os.path.join(opt.out_dir, f"pred_{i}.bgeo"), pts)

    threads = []
    for i, pts in enumerate(outputs):
        th = threading.Thread(target=_write, args=(i, pts))
        th.start()
        threads.append(th)
        if len(threads) >= 8:
            threads.pop(0).join()
    for th in threads:
        th.join()
    print(f"wrote {len(outputs)} frames to {opt.out_dir}")


if __name__ == "__main__":
    main()
