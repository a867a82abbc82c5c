#!/usr/bin/env bash
# Blessed action training recipe — one-to-one with the reference
# train_action/train_dir/train.sh (100k iters, lr 3e-4, batch 4,
# ckpt every 10k). Extra flags pass through.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tpugan_tpu.cli.train_action --preset train_dir "$@"
