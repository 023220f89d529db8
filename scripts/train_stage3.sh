#!/usr/bin/env bash
# train_stage3.sh equivalent (reference repo root). The reference's multi-node DDP env
# (MASTER_ADDR/NODE_RANK/NCCL_IB_* tuning) collapses on TPU to
# jax.distributed auto-init; for non-TPU clusters set
# JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
set -euo pipefail
CONFIG=${1:-configs_c2i/ReCo_large_stage3.yaml}
shift || true
python -m deco_tpu.cli fit -c "$CONFIG" "$@"
