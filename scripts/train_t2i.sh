#!/usr/bin/env bash
# t2i SFT launch (reference train_stage2.sh equivalent).
set -euo pipefail
CONFIG=${1:-configs_t2i/sft_res512.yaml}
shift || true
python -m deco_tpu.cli fit -c "$CONFIG" "$@"
