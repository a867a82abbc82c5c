"""Record the secondary throughput artifacts (VERDICT round-2 item 3).

Produces/updates a JSON artifact with:
  * ``rollout``     — 800-frame sequence rollout frames/s at 10240-point
    frames (the reference's inference product: the demo.ipynb cell-3 bunny
    rollout loop), via the pipelined ``eval.rollout.rollout_sequence``.
  * ``train_fluid`` — fluid GAN train-step it/s at the blessed config
    (batch 4 x 9216-pt patches, use_vel, adversarial branch live).
  * ``train_action``— action GAN train-step it/s (batch 4 x 2048 pts,
    frame clips from the synthetic MSR fixture pipeline).
  * ``emd``         — auction-EMD solve seconds at the reference harness
    config (8 x 79,872; analysis_helper.py:306-344) — optional, ~5 min.

Each section is independently selectable so sections can be measured in
separate windows of chip availability; results merge into ``--out``.

Usage: python tools/bench_artifacts.py --out BENCH_EXTRA_r03.json \
           [--rollout] [--train_fluid] [--train_action] [--emd]
"""
import argparse
import json
import os
import time

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tpugan_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np


def bench_rollout(num_frames=800, particles=10240):
    from tpugan_tpu.data.synthetic import synthetic_fluid_sequence
    from tpugan_tpu.eval.rollout import rollout_sequence
    from tpugan_tpu.models import SRNet

    # deployment configuration: bf16 inner activations + ONE shared input
    # kNN graph — bench.py's gated headline serving mode (the gate checks
    # prediction parity against the exact f32 dynamic-graph forward;
    # BENCH_NOTES.md round 3 records trained-checkpoint parity)
    model = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=8,
                  compute_dtype=jnp.bfloat16, graph_mode="static")
    frames = list(synthetic_fluid_sequence(
        seed=3, num_particles=particles, num_frames=num_frames))
    pos0 = jnp.asarray(frames[0][0], jnp.float32)[None]
    variables = jax.jit(lambda k, f, q: model.init(k, f, q, False))(
        jax.random.PRNGKey(0), pos0, pos0)
    # warm the compile (2 frames) before the timed pass
    rollout_sequence(model, variables, frames[:2])
    t0 = time.time()
    outputs = rollout_sequence(model, variables, frames)
    used = time.time() - t0
    assert len(outputs) == num_frames
    return {
        "frames": num_frames,
        "points_per_frame": particles,
        "upsample_ratio": 8,
        "seconds": round(used, 2),
        "frames_per_sec": round(num_frames / used, 2),
    }


def bench_rollout_device(num_frames=800, particles=10240):
    """Device-resident lax.scan rollout (eval/rollout.py
    rollout_sequence_device): chunks of 100 frames advance the mask ring on
    device; D2H overlaps the next chunk's compute."""
    from tpugan_tpu.data.synthetic import synthetic_fluid_sequence
    from tpugan_tpu.eval.rollout import rollout_sequence_device
    from tpugan_tpu.models import SRNet

    model = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=8,
                  compute_dtype=jnp.bfloat16, graph_mode="static")
    frames = list(synthetic_fluid_sequence(
        seed=3, num_particles=particles, num_frames=num_frames))
    pos = np.stack([np.asarray(f[0], np.float32) for f in frames])
    pos0 = jnp.asarray(pos[:1])
    variables = jax.jit(lambda k, f, q: model.init(k, f, q, False))(
        jax.random.PRNGKey(0), pos0, pos0)
    rollout_sequence_device(model, variables, pos[:100])   # warm compile
    t0 = time.time()
    outputs = rollout_sequence_device(model, variables, pos)
    used = time.time() - t0
    assert len(outputs) == num_frames
    result = {
        "frames": num_frames,
        "points_per_frame": particles,
        "upsample_ratio": 8,
        "seconds": round(used, 2),
        "frames_per_sec": round(num_frames / used, 2),
    }
    # On-device rate from a profiler trace: the wall number above pays the
    # axon tunnel's D2H (~1 MB/frame of outputs), which a production host
    # fetches over PCIe at negligible cost — and under the tunnel the
    # concurrent output drain measurably stalls the device itself (chunk
    # programs run ~2.3x longer with a drain in flight). Trace a pure scan
    # chain (mask state carried, one fetch at the end) to isolate the
    # program rate, same methodology as bench.py's headline.
    try:
        import glob
        import shutil

        from tpugan_tpu.eval.rollout import make_rollout_scan
        from tpugan_tpu.models.generator import RolloutMaskState

        chunk = 100
        scan_fn = make_rollout_scan(model, False, chunk)
        mstate = RolloutMaskState.create(1, pos.shape[1], 25)
        chunks = [jnp.asarray(pos[i * chunk:(i + 1) * chunk])
                  for i in range(3)]
        zeros = jnp.zeros_like(chunks[0])
        mstate, outs, _ = scan_fn(variables, mstate, chunks[0], zeros)
        _ = float(outs[0, 0, 0])                       # warm + sync
        tdir = "/tmp/tpugan_rollout_trace"
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for c in chunks:
                mstate, outs, _ = scan_fn(variables, mstate, c, zeros)
            _ = float(outs[0, 0, 0])
        path = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)[0]
        pd = jax.profiler.ProfileData.from_serialized_xspace(
            open(path, "rb").read())
        # match the scan program by its jitted name — a generic
        # ('jit_' and large) filter would average in any other big
        # program that lands in the trace window (ADVICE round 3)
        spans = [ev.duration_ns
                 for plane in pd.planes if "TPU" in plane.name
                 for line in plane.lines for ev in line.events
                 if "scan_fn" in ev.name and ev.duration_ns > 5e7]
        if len(spans) != len(chunks):
            raise RuntimeError(
                f"expected {len(chunks)} scan_fn spans in the trace, "
                f"found {len(spans)} — refusing a skewed rate")
        # each span is one chunk-frame scan program
        ms_per_frame = float(np.mean(spans)) / 1e6 / chunk
        result["device_ms_per_frame"] = round(ms_per_frame, 3)
        result["device_frames_per_sec"] = round(1e3 / ms_per_frame, 2)
    except Exception as e:  # trace parsing is best-effort
        print(f"# rollout device-trace unavailable: {e}")
    return result


def _time_steps(jstep, state, batch, n_steps=30, warmup=5):
    for i in range(warmup):
        state, metrics = jstep(state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics)
    t0 = time.time()
    for i in range(n_steps):
        state, metrics = jstep(state, batch, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(metrics)
    return (time.time() - t0) / n_steps


def bench_train_fluid():
    from tpugan_tpu.config import FluidTrainConfig
    from tpugan_tpu.train import init_fluid_state, make_fluid_gan_step

    cfg = FluidTrainConfig(
        batch_size=4, patch_size=9216, use_vel=True, in_node_feats=6,
        ml_gate=10.0,  # force the adversarial branch live
        log_dir="/tmp/bench_artifacts_fluid",
    )
    models, txs, state = init_fluid_state(cfg, jax.random.PRNGKey(0))
    jstep = make_fluid_gan_step(models, txs, cfg)
    rng = np.random.default_rng(0)
    n, m = cfg.lowres_size, cfg.patch_size
    batch = {
        "lowres_pos": jnp.asarray(
            rng.standard_normal((3, 4, n, 3)).astype(np.float32) * 0.3),
        "lowres_vel": jnp.asarray(
            rng.standard_normal((3, 4, n, 3)).astype(np.float32) * 0.1),
        "highres_pos": jnp.asarray(
            rng.standard_normal((3, 4, m, 3)).astype(np.float32) * 0.3),
        "highres_vel": jnp.asarray(
            rng.standard_normal((3, 4, m, 3)).astype(np.float32) * 0.1),
    }
    state = state.replace(n_iter=jnp.int32(101))  # past warmup, even iter
    sec = _time_steps(jstep, state, batch)
    return {
        "config": "batch4 x 9216pt, use_vel, adversarial live",
        "sec_per_step": round(sec, 4),
        "it_per_sec": round(1.0 / sec, 2),
    }


def bench_train_action():
    import tempfile

    from tpugan_tpu.config import ActionTrainConfig
    from tpugan_tpu.data import MSRAction3DDataset, action_batch_iterator
    from tpugan_tpu.data.synthetic import make_synthetic_action_dataset
    from tpugan_tpu.train import init_action_state, make_action_gan_step

    data_dir = os.path.join(tempfile.gettempdir(), "bench_artifacts_msr")
    make_synthetic_action_dataset(data_dir, num_videos=6, frames=10,
                                  points=3000, seed=0)
    cfg = ActionTrainConfig(data_dir=data_dir, batch_size=4,
                            log_dir="/tmp/bench_artifacts_action")
    dataset = MSRAction3DDataset(
        data_dir, frames_per_clip=cfg.frames_per_clip,
        num_points=cfg.num_points, fps_ratio=cfg.fps_ratio, seed=0)
    batch = next(action_batch_iterator(dataset, cfg.batch_size, seed=0))
    feed = {"lowres_pos": jnp.asarray(batch["lowres_pos"]),
            "highres_pos": jnp.asarray(batch["highres_pos"])}
    models, txs, state = init_action_state(cfg, jax.random.PRNGKey(0))
    jstep = make_action_gan_step(models, txs, cfg)
    state = state.replace(n_iter=jnp.int32(101))
    sec = _time_steps(jstep, state, feed)
    return {
        "config": f"batch4 x {cfg.num_points}pt x {cfg.frames_per_clip} frames",
        "sec_per_step": round(sec, 4),
        "it_per_sec": round(1.0 / sec, 2),
    }


def bench_emd(batch=8, n=79872, iters=100):
    from tpugan_tpu.ops.metrics import auction_assignment

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32))
    t0 = time.time()
    assign = jax.block_until_ready(auction_assignment(x, y, iters=iters))
    used = time.time() - t0
    uniq = float(np.mean([len(np.unique(np.asarray(assign[i])))
                          for i in range(batch)]))
    return {
        "config": f"{batch} x {n} (reference harness size), iters={iters}",
        "seconds": round(used, 1),
        "mean_unique_assignments": round(uniq, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="BENCH_EXTRA_r03.json")
    p.add_argument("--rollout", action="store_true")
    p.add_argument("--rollout_device", action="store_true")
    p.add_argument("--train_fluid", action="store_true")
    p.add_argument("--train_action", action="store_true")
    p.add_argument("--emd", action="store_true")
    opt = p.parse_args()

    results = {}
    if os.path.exists(opt.out):
        with open(opt.out) as fh:
            results = json.load(fh)
    results.setdefault("device", jax.devices()[0].device_kind)

    for name, fn in (("rollout", bench_rollout),
                     ("rollout_device", bench_rollout_device),
                     ("train_fluid", bench_train_fluid),
                     ("train_action", bench_train_action),
                     ("emd", bench_emd)):
        if getattr(opt, name):
            print(f"=== {name}")
            results[name] = fn()
            print(json.dumps(results[name], indent=1))
            with open(opt.out, "w") as fh:
                json.dump(results, fh, indent=1)
    print(f"wrote {opt.out}")


if __name__ == "__main__":
    main()
