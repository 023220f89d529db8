#!/usr/bin/env bash
# 50k-sample FID predict -> ADM-suite output.npz (README.md:102 protocol).
set -euo pipefail
CONFIG=${1:?config}; CKPT=${2:?ckpt_path}
python -m deco_tpu.cli predict -c "$CONFIG" --ckpt_path="$CKPT"
