#!/usr/bin/env bash
# Multi-host data-parallel training launcher — the JAX analog of the
# reference's tools/dist_train.sh (torch.distributed.launch, 8 GPU):
#   /root/reference/tools/dist_train.sh:3
#
# On TPU, parallelism inside one host is automatic: a single process drives
# every locally-attached chip through the GSPMD dp mesh (parallel/mesh.py),
# so there is no --nproc_per_node. Multi-HOST pods launch one process per
# host with a shared coordinator:
#
#   single host, all local chips:
#       bash tools/dist_train.sh --cfg_file cfgs/models/kitti/VirConv-T.yaml
#
#   N-host pod (run on every host; HOST_ID = 0..N-1):
#       JAX_NUM_PROCESSES=N JAX_PROCESS_ID=$HOST_ID \
#       JAX_COORDINATOR=host0:12345 \
#       bash tools/dist_train.sh --cfg_file cfgs/models/kitti/VirConv-T.yaml
#
# On Cloud TPU pods created with a metadata server (GCE/GKE), omit the env
# vars entirely: jax.distributed.initialize auto-detects the topology, and
# train.py --launcher jax calls it either way.
set -euo pipefail
cd "$(dirname "$0")"

: "${JAX_NUM_PROCESSES:=1}"
: "${JAX_PROCESS_ID:=0}"
: "${JAX_COORDINATOR:=127.0.0.1:12345}"
export JAX_NUM_PROCESSES JAX_PROCESS_ID JAX_COORDINATOR

LOG="log_train_p${JAX_PROCESS_ID}.txt"
nohup python3 -u train.py --launcher jax "$@" > "$LOG" 2>&1 &
echo "train.py (process ${JAX_PROCESS_ID}/${JAX_NUM_PROCESSES}) -> ${LOG}"
