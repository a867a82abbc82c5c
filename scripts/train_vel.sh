#!/usr/bin/env bash
# Blessed fluid velocity-conditioned training recipe — one-to-one with the
# reference train_fluid/train_vel/train.sh (--use_vel --in_node_feats 6,
# 80k iters, batch 4, ckpt every 10k). Extra flags pass through.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tpugan_tpu.cli.train_fluid --preset train_vel "$@"
