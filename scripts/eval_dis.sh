#!/usr/bin/env bash
# Blessed feature-transfer evaluation recipe — one-to-one with the
# reference train_action/eval_dis/run.sh. Point --data_dir at the
# MSR-Action3D directory and --ckpt_path at a trained GAN checkpoint.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tpugan_tpu.cli.eval_tempo_feat --preset eval_dis "$@"
