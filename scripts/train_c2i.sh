#!/usr/bin/env bash
# c2i training launch (reference train.sh equivalent).
#
# The reference's multi-node env dance (MASTER_ADDR/PORT, NNODES, NODE_RANK,
# NGPUS_PER_NODE, NCCL_IB_* tuning, train.sh:1-41) collapses on TPU to
# jax.distributed auto-init: on a TPU pod slice each host runs this same
# command and discovers the mesh from the platform. For non-TPU clusters set:
#   JAX_COORDINATOR_ADDRESS=<host:port> JAX_NUM_PROCESSES=<N> JAX_PROCESS_ID=<i>
set -euo pipefail
CONFIG=${1:-configs_c2i/DeCo_XL.yaml}
shift || true
python -m deco_tpu.cli fit -c "$CONFIG" "$@"
