#!/usr/bin/env bash
# Meta-loss dose-response grid (VERDICT r4 #5): before concluding "the
# paper's effect doesn't replicate", test whether the flagship recipe's
# LOSS_FAC=10 is an overweighting artifact at this data scale — the
# reference gates the meta term late (EFFECT_AFER_EP_PERCENT,
# lib/workflow.py:126-144) but never sweeps its weight.
#
# Arms: ot x LOSS_FAC in {1, 3} x seeds {0, 1, 2} (LOSS_FAC=10 is the
# existing ot_pc arm — same data seed + schedule, so the dose curve reads
# {baseline_pc, ot_pc_fac1, ot_pc_fac3, ot_pc} per seed). Same
# evidence-commit discipline as ablation_queue.sh.
#
# IMPORTANT: one TPU process at a time (the axon tunnel wedges two
# clients) — do not run alongside bench.py or the main ablation queue.
#
# Usage: bash scripts/dose_queue.sh [max_arms]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-100}
RES=results/ablation/ablation_results.json

have() {
  python - "$1" "$2" "$RES" <<'EOF'
import json, sys, os
v, s, f = sys.argv[1], int(sys.argv[2]), sys.argv[3]
recs = json.load(open(f)) if os.path.exists(f) else []
sys.exit(0 if any(r["variant"] == v and r["seed"] == s for r in recs) else 1)
EOF
}

commit_evidence() {
  for _ in 1 2 3 4 5; do
    if git commit -q -m "$1" -- "$RES"; then return 0; fi
    git diff --quiet -- "$RES" && return 0
    sleep 3
  done
  echo "WARNING: could not commit $RES ($1)" >&2
  return 1
}

run=0
STOP_FILE=${STOP_FILE:-/tmp/ablation_stop}
arm() {  # arm RECORDED_AS SEED LOSS_FAC TAG
  local recorded_as=$1 seed=$2 fac=$3 tag=$4
  if [ -e "$STOP_FILE" ]; then
    echo "=== dose queue: stop file present — exiting at arm boundary ==="
    exit 0
  fi
  [ "$run" -ge "$MAX" ] && exit 0
  if have "$recorded_as" "$seed"; then return 0; fi
  echo "=== dose queue: ${recorded_as} seed ${seed} (LOSS_FAC ${fac}) ==="
  python scripts/ablation_check.py --variants ot --seeds "$seed" \
    --color-mode paired --loss-fac "$fac" --tag "$tag" || exit 1
  commit_evidence "Ablation record: ${recorded_as} seed ${seed}"
  run=$((run + 1))
}

# seed-major so a truncated run still leaves a paired dose column
for seed in 0 1 2; do
  arm "ot_pc_fac1" "$seed" 1 fac1
  arm "ot_pc_fac3" "$seed" 3 fac3
done
