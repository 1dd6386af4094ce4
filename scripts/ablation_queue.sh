#!/usr/bin/env bash
# Gap-filling queue for the multi-seed held-out ablation grids (README
# "Capability evidence"; VERDICT r2 #2, r3 #1/#2). Runs arm-seeds in
# priority order, skipping any (variant, seed) already recorded in
# $RES — each finished arm appends its record there immediately AND
# commits it to git (VERDICT r3 #8: evidence-commit discipline as
# mechanism, not intention), so killing this script loses at most the
# in-flight arm and never leaves evidence uncommitted.
#
# Priority order (truncation-friendly — each block is independently
# useful if the chip budget runs out):
#   1. from-scratch paired-color seed 3            (grid to n=5)
#   2. warm-graft pretrain (48-ep baseline, once) + ft seeds 1..3
#      x {baseline, l2-identity, ot-identity}      (VERDICT r3 #2, n=4)
#   3. from-scratch seeds 5..12                    (grid to n>=7)
#
# IMPORTANT: one TPU process at a time (the axon tunnel wedges two
# clients) — do not run this alongside bench.py or another ablation run.
#
# Usage: bash scripts/ablation_queue.sh [max_arms]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-100}
RES=results/ablation/ablation_results.json
PRETRAIN_NPZ=results/ablation/pretrain_baseline_pc.npz
PRETRAIN_SEED=100

have() {  # have VARIANT SEED -> 0 if the record already exists in $RES
  python - "$1" "$2" "$RES" <<'EOF'
import json, sys, os
v, s, f = sys.argv[1], int(sys.argv[2]), sys.argv[3]
recs = json.load(open(f)) if os.path.exists(f) else []
sys.exit(0 if any(r["variant"] == v and r["seed"] == s for r in recs) else 1)
EOF
}

commit_evidence() {  # commit_evidence MSG — commit $RES only (other staged
  # work untouched: `git commit -- <path>` records the named path as on
  # disk, leaving the index alone). Retries around a concurrent commit's
  # index.lock from the interactive session.
  for _ in 1 2 3 4 5; do
    if git commit -q -m "$1" -- "$RES"; then return 0; fi
    # nothing to commit (record unchanged) -> done; lock contention -> retry
    git diff --quiet -- "$RES" && return 0
    sleep 3
  done
  echo "WARNING: could not commit $RES ($1)" >&2
  return 1
}

run=0
STOP_FILE=${STOP_FILE:-/tmp/ablation_stop}
arm() {  # arm VARIANT SEED EXTRA_ARGS... — run one arm unless recorded
  local recorded_as=$1 variant=$2 seed=$3; shift 3
  # graceful pause point: killing the in-flight python mid-RPC wedges the
  # axon tunnel for ~30 min — interject by `touch $STOP_FILE` and waiting
  # for the current arm to finish instead
  if [ -e "$STOP_FILE" ]; then
    echo "=== queue: stop file $STOP_FILE present — exiting at arm boundary ==="
    exit 0
  fi
  [ "$run" -ge "$MAX" ] && exit 0
  if have "$recorded_as" "$seed"; then return 0; fi
  echo "=== queue: ${recorded_as} seed ${seed} ==="
  python scripts/ablation_check.py --variants "$variant" --seeds "$seed" \
    --color-mode paired "$@" || exit 1
  commit_evidence "Ablation record: ${recorded_as} seed ${seed}"
  run=$((run + 1))
}

# --- 1. complete the from-scratch grid to n=5 -------------------------------
for variant in baseline l2 ot; do
  arm "${variant}_pc" "$variant" 3
done

# --- 2. warm-graft regime (VERDICT r3 #2) ------------------------------------
# one converged 48-epoch DEV.SWITCH=False pretrain, shared by all ft arms
# below (the reference's COCO-pretrain analogue, tools/utils.py:271-313);
# seed 0's ft arms (round 2/3) used an earlier, since-lost pretrain — their
# paired deltas remain within-seed valid and are kept as-is.
if [ ! -f "$PRETRAIN_NPZ" ]; then
  arm "baseline_pc_pretrain" baseline "$PRETRAIN_SEED" \
    --schedule 32,8,8 --tag pretrain
  python scripts/export_ckpt_npz.py \
    "results/ablation/baseline_s${PRETRAIN_SEED}_pc_pretrain" \
    "$PRETRAIN_NPZ" || exit 1
fi
for seed in 1 2 3; do
  arm "baseline_ft_pc" baseline "$seed" --schedule 8,4,4 \
    --init-npz "$PRETRAIN_NPZ"
  arm "l2_ft_pc_id" l2 "$seed" --schedule 8,4,4 --init-npz "$PRETRAIN_NPZ" \
    --tag id --upsample-init identity --upsample-residual
  arm "ot_ft_pc_id" ot "$seed" --schedule 8,4,4 --init-npz "$PRETRAIN_NPZ" \
    --tag id --upsample-init identity --upsample-residual
done

# --- 3. widen the from-scratch grid seed-by-seed -----------------------------
# full range (ADVICE r3): have() skips complete arms, so deleted/partial
# records for early seeds are re-filled instead of silently assumed done
for seed in 0 1 2 4 5 6 7 8 9 10 11 12; do
  for variant in baseline l2 ot; do
    arm "${variant}_pc" "$variant" "$seed"
  done
done
