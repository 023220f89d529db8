#!/usr/bin/env bash
# train_uni_sem.sh equivalent (reference repo root). The reference's multi-node DDP env
# (MASTER_ADDR/NODE_RANK/NCCL_IB_* tuning) collapses on TPU to
# jax.distributed auto-init; for non-TPU clusters set
# JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
set -euo pipefail
CONFIG=${1:-configs_flow/uniflow_internvit_2b_blip3o_sem.yaml}
shift || true
python -m deco_tpu.cli fit -c "$CONFIG" "$@"
