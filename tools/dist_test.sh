#!/usr/bin/env bash
# Multi-host distributed evaluation launcher — the JAX analog of the
# reference's tools/dist_test.sh (/root/reference/tools/dist_test.sh:3).
# Each host process evaluates its pad+stride shard of the val split
# (datasets/__init__.py eval sharding); rank 0 merges the per-rank pickles
# (parallel/dist.py merge_results_dist) and computes AP.
#
#   single host:  bash tools/dist_test.sh --cfg_file ... --ckpt <dir>
#   N-host pod:   JAX_NUM_PROCESSES=N JAX_PROCESS_ID=$HOST_ID \
#                 JAX_COORDINATOR=host0:12345 bash tools/dist_test.sh ...
set -euo pipefail
cd "$(dirname "$0")"

: "${JAX_NUM_PROCESSES:=1}"
: "${JAX_PROCESS_ID:=0}"
: "${JAX_COORDINATOR:=127.0.0.1:12345}"
export JAX_NUM_PROCESSES JAX_PROCESS_ID JAX_COORDINATOR

LOG="log_test_p${JAX_PROCESS_ID}.txt"
nohup python3 -u test.py --launcher jax "$@" > "$LOG" 2>&1 &
echo "test.py (process ${JAX_PROCESS_ID}/${JAX_NUM_PROCESSES}) -> ${LOG}"
