#!/usr/bin/env bash
# Extend the from-scratch grid on the ONE unresolved direction (VERDICT
# r4 #1): at n=8 the ot arm's paired AP_medium delta is +0.036 ± 0.058
# with CI [-0.000, +0.076] (6/8 seeds positive) and the power row says
# ~11 seeds; baseline+ot seeds 8..10 close that gap. The l2 arm is NOT
# extended: its AP CI already excludes zero ([-0.051, -0.003] at n=8) —
# the flagship recipe is a resolved small negative from scratch.
#
# Same evidence-commit discipline and stop-file pause as
# ablation_queue.sh. One TPU process at a time.
#
# Usage: bash scripts/extend_ot_seeds.sh [max_arms]
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
arm() {
  local variant=$1 seed=$2
  if [ -e "$STOP_FILE" ]; then
    echo "=== extend queue: stop file present — exiting at arm boundary ==="
    exit 0
  fi
  [ "$run" -ge "$MAX" ] && exit 0
  if have "${variant}_pc" "$seed"; then return 0; fi
  echo "=== extend queue: ${variant}_pc seed ${seed} ==="
  python scripts/ablation_check.py --variants "$variant" --seeds "$seed" \
    --color-mode paired || exit 1
  commit_evidence "Ablation record: ${variant}_pc seed ${seed}"
  run=$((run + 1))
}

for seed in 8 9 10; do
  arm baseline "$seed"
  arm ot "$seed"
done
