#!/usr/bin/env bash
# TPU-slice training launcher — the reference's script/base_4gpu.sh /
# base_8gpu.sh rebuilt for SPMD-over-mesh (/root/reference/script/*.sh).
#
# The reference pinned GPUs with CUDA_VISIBLE_DEVICES and nn.DataParallel;
# on TPU the data-parallel degree comes from the devices JAX sees: all chips
# of the slice this host is attached to. main.py builds a 1-D `data` mesh
# over them automatically (TPU.MESH_DATA=-1), so the same command scales
# from 1 chip to a full slice with no code or flag changes.
#
# Usage: scripts/train_slice.sh <config-rel-path-under-configs/, no .yaml> \
#        [extra KEY.SUBKEY VALUE overrides...]
# e.g.:  scripts/train_slice.sh 105/meta_105_quick_1 TRAIN.BATCH_SIZE 32
#
# For a CPU-simulated 8-device mesh (no TPU), prefix with:
#   XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu

set -euo pipefail

if [ -z "${1:-}" ]; then
  echo "No config_file (.yaml) argument." >&2
  exit 1
fi

config_file="configs/$1.yaml"
shift
echo "$config_file"

exec python main.py \
  --phase train \
  --debug 0 \
  --config_file "$config_file" \
  "$@"
