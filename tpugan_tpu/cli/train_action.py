"""MSR-Action3D GAN training entry point.

Mirrors the reference CLI ``train_action/train_msr.py`` (args :30-83, loop
:112-285); blessed config is ``--iters 100000``
(train_action/train_dir/train.sh). ``--synthetic`` trains on generated
MSR-schema fixtures.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np


def get_arguments(parser: argparse.ArgumentParser, argv=None):
    add = parser.add_argument
    add("--lr", type=float, default=3e-4)
    add("--resume", action="store_true")
    add("--path_to_resume", type=str, default=None)
    add("--iters", type=int, default=100000)
    add("--log_dir", type=str, default="./")
    add("--ckpt_every", type=int, default=10000)
    add("--node_embedding", type=int, default=128)
    add("--R", type=float, default=2.0)
    add("--data_dir", type=str, default="./MSR-Action3D")
    add("--batch_size", type=int, default=4)
    add("--num_points", type=int, default=2048)
    add("--w", type=float, default=2.0)
    add("--exact_graph", action="store_true",
        help="exact feature-space kNN graphs instead of the approximate "
             "bf16 kernel (ops/neighbors.py graph_knn)")
    add("--freeze_D", action="store_true")
    add("--fast_d", action="store_true",
        help="stack the D towers' per-frame and fake/real applies into one "
             "batched apply (see train_fluid --fast_d)")
    add("--dump_visualization", action="store_true")
    add("--device_sampling", action="store_true",
        help="per-frame FPS downsample on device inside the jitted step "
             "(fps_pallas) instead of in the host loader")
    add("--synthetic", action="store_true")
    add("--synthetic_videos", type=int, default=6)
    add("--synthetic_classes", type=int, default=3)
    add("--synthetic_frames", type=int, default=10)
    add("--data_parallel", action="store_true")
    add("--profile", action="store_true",
        help="capture a jax.profiler device trace of steps 10-15 into "
             "<log_dir>/profile")
    add("--seed", type=int, default=1)
    from tpugan_tpu.config import parse_with_preset

    return parse_with_preset(parser, "train_action", argv)



def _enable_compile_cache():
    import jax

    os.makedirs(os.path.expanduser("~/.cache/tpugan_jax"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tpugan_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    _enable_compile_cache()
    parser = argparse.ArgumentParser(description="Train action GAN")
    opt = get_arguments(parser)
    print("Using following options")
    print(opt)

    if opt.exact_graph:
        from tpugan_tpu.ops.neighbors import set_approx_graph_knn

        set_approx_graph_knn(False)

    from tpugan_tpu.config import ActionTrainConfig
    from tpugan_tpu.data import MSRAction3DDataset, action_batch_iterator
    from tpugan_tpu.data.synthetic import make_synthetic_action_dataset
    from tpugan_tpu.parallel import make_mesh
    from tpugan_tpu.parallel.mesh import device_put_batch, device_put_replicated, replicated
    from tpugan_tpu.train import (
        init_action_state, load_checkpoint, make_action_gan_step, ensure_dir,
    )
    from tpugan_tpu.train.checkpoint import save_checkpoint_async
    from tpugan_tpu.train.state import param_count
    from tpugan_tpu.utils import MetricWriter, StepTimer

    data_dir = opt.data_dir
    if opt.synthetic:
        data_dir = os.path.join(opt.log_dir, "synthetic_msr")
        print(f"Generating synthetic MSR dataset at {data_dir}")
        make_synthetic_action_dataset(data_dir,
                                      num_videos=opt.synthetic_videos,
                                      frames=opt.synthetic_frames,
                                      points=3000,
                                      num_classes=opt.synthetic_classes,
                                      seed=opt.seed)

    cfg = ActionTrainConfig(
        lr=opt.lr, iters=opt.iters, ckpt_every=opt.ckpt_every,
        node_embedding=opt.node_embedding, R=opt.R, data_dir=data_dir,
        batch_size=opt.batch_size, num_points=opt.num_points, w=opt.w,
        device_sampling=opt.device_sampling,
        freeze_D=opt.freeze_D, fast_d=opt.fast_d,
        dump_visualization=opt.dump_visualization,
        log_dir=opt.log_dir, seed=opt.seed, data_parallel=opt.data_parallel,
    )

    print("Preparing the data")
    dataset = MSRAction3DDataset(
        cfg.data_dir, frames_per_clip=cfg.frames_per_clip,
        num_points=cfg.num_points, fps_ratio=cfg.fps_ratio, seed=cfg.seed,
        return_lowres=not cfg.device_sampling,
    )
    from tpugan_tpu.data.prefetch import prefetch_iterator

    batches = prefetch_iterator(
        action_batch_iterator(dataset, cfg.batch_size, seed=cfg.seed), size=2
    )

    # held-out split for the every-ckpt-interval eval pass (reference
    # train_msr.py:230-262 runs test-loader dumps there)
    test_dataset = MSRAction3DDataset(
        cfg.data_dir, frames_per_clip=cfg.frames_per_clip,
        num_points=cfg.num_points, fps_ratio=cfg.fps_ratio, seed=cfg.seed,
        train=False,
    )
    test_batches = (
        action_batch_iterator(test_dataset, cfg.batch_size,
                              seed=cfg.seed + 7)
        if len(test_dataset) >= cfg.batch_size else None
    )
    if test_batches is None:
        print("no held-out test clips found; skipping test-split eval")

    print("Building network")
    models, txs, state = init_action_state(cfg, jax.random.PRNGKey(cfg.seed))
    print(f"Total trainable parameters (sr_net): {param_count(state.sr.params)}")
    print(f"Total trainable parameters (tempo_dis): {param_count(state.tempo.params)}")
    print(f"Total trainable parameters (spatial_dis): {param_count(state.spatial.params)}")

    mesh = make_mesh() if cfg.data_parallel else None
    step = make_action_gan_step(models, txs, cfg, mesh=mesh)
    if mesh is not None:
        state = device_put_replicated(state, mesh)

    checkpoint_dir = os.path.join(cfg.log_dir, "model_ckpt")
    ensure_dir(checkpoint_dir)
    if opt.resume:
        state = load_checkpoint(opt.path_to_resume or checkpoint_dir, state)
        print("last checkpoint restored")

    writer = MetricWriter(cfg.log_dir)
    timer = StepTimer()
    n_iter = int(np.asarray(state.n_iter))
    start_iter = n_iter
    step_key = jax.random.PRNGKey(cfg.seed + 1)
    start = time.time()
    ckpt_future = None

    while n_iter < cfg.iters:
        batch = next(batches)
        feed = {
            k: batch[k] for k in ("lowres_pos", "highres_pos") if k in batch
        }
        if mesh is not None:
            feed = device_put_batch(feed, mesh)
        timer.data_ready()

        step_key, sub = jax.random.split(step_key)
        if mesh is not None:
            sub = jax.device_put(sub, replicated(mesh))
        if opt.profile and n_iter == 10:
            jax.profiler.start_trace(os.path.join(cfg.log_dir, "profile"))
        state, metrics = step(state, feed, sub)
        n_iter += 1
        timer.step_done()
        writer.add(n_iter, metrics)
        if opt.profile and n_iter == 15:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            print(f"profiler trace written to {cfg.log_dir}/profile")

        if n_iter % 50 == 0:
            host = {k: float(v) for k, v in jax.device_get(metrics).items()}
            rate = (n_iter - start_iter) / (time.time() - start)
            print(
                f"iter {n_iter}/{cfg.iters} ({rate:.2f} it/s, "
                f"eff {timer.compute_efficiency:.2f}): "
                + ", ".join(f"{k}={v:.4f}" for k, v in host.items()),
                flush=True,
            )

        if (n_iter - 1) % cfg.ckpt_every == 0 or n_iter >= cfg.iters:
            if test_batches is not None:
                test_cd = _test_eval(
                    models[0], state, test_batches, cfg, n_iter,
                    dump=cfg.dump_visualization,
                )
                writer.add(n_iter, {"test_Chamfer_distance": test_cd})
                print(f"iter {n_iter}: test Chamfer (per-point) = "
                      f"{test_cd:.6f}", flush=True)
            ckpt_future = save_checkpoint_async(
                state,
                os.path.join(checkpoint_dir, f"tpugan_checkpoint{n_iter}.ckpt"),
                max_keep=5,
            )

    if ckpt_future is not None:
        ckpt_future.result()  # join the async writer before exit
    writer.close()
    print("exiting...")


# jitted eval fns keyed per generator instance (see cli/train_fluid.py)
_TEST_EVAL_FNS = {}


def _test_eval(sr_model, state, test_batches, cfg, n_iter, dump=False,
               n_batches=4):
    """Eval-mode pass over held-out test clips (reference
    train_msr.py:230-262): per-point test Chamfer on frame 0 of each batch,
    plus gt/input/pred renders through the PNG visualizer when
    ``dump`` is set (the reference's Open3D offscreen captures)."""
    import jax.numpy as jnp

    from tpugan_tpu.data.sampling import dump_pointcloud_visualization
    from tpugan_tpu.ops.metrics import chamfer

    key = id(sr_model)
    if key not in _TEST_EVAL_FNS:
        def fwd(params, lowres, highres):
            pred, _ = sr_model.apply({"params": params}, lowres, lowres,
                                     False)
            cd = chamfer(pred, highres)
            return pred, jnp.mean(cd) / highres.shape[-2]

        _TEST_EVAL_FNS[key] = jax.jit(fwd)
    eval_fn = _TEST_EVAL_FNS[key]

    params = jax.device_get(state.sr.params)
    sample_dir = os.path.join(cfg.log_dir, "samples")
    cds = []
    for j in range(n_batches):
        batch = next(test_batches)
        lowres = batch["lowres_pos"][0]       # frame 0, [B, n, 3]
        highres = batch["highres_pos"][0]
        pred, cd = eval_fn(params, lowres, highres)
        cds.append(float(cd))
        if dump:
            os.makedirs(sample_dir, exist_ok=True)
            dump_pointcloud_visualization(
                highres[0], os.path.join(sample_dir, f"gt_iter{n_iter}_{j}.png"))
            dump_pointcloud_visualization(
                lowres[0], os.path.join(sample_dir, f"input_iter{n_iter}_{j}.png"))
            dump_pointcloud_visualization(
                np.asarray(pred)[0],
                os.path.join(sample_dir, f"pred_iter{n_iter}_{j}.png"))
    return float(np.mean(cds))


if __name__ == "__main__":
    main()
