#!/usr/bin/env bash
# Blessed fluid position-only training recipe — one-to-one with the
# reference train_fluid/train_novel/train.sh (80k iters, batch 4,
# ckpt every 10k). Extra flags pass through.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tpugan_tpu.cli.train_fluid --preset train_novel "$@"
