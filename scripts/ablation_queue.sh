#!/usr/bin/env bash
# Gap-filling queue for the >=10-seed held-out ablation grid (README
# "Capability evidence"; VERDICT r2 #2). Runs arm-seeds in priority order,
# skipping any (variant, seed) already recorded in
# results/ablation/ablation_results.json — each finished arm appends its
# record there immediately, so killing this script loses at most the
# in-flight arm.
#
# IMPORTANT: one TPU process at a time (the axon tunnel wedges two
# clients) — do not run this alongside bench.py or another ablation run.
#
# Usage: bash scripts/ablation_queue.sh [max_arms]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-100}
RES=results/ablation/ablation_results.json

have() {  # have VARIANT SEED -> 0 if the record already exists
  python - "$1" "$2" <<'EOF'
import json, sys, os
v, s = sys.argv[1], int(sys.argv[2])
f = "results/ablation/ablation_results.json"
recs = json.load(open(f)) if os.path.exists(f) else []
sys.exit(0 if any(r["variant"] == v and r["seed"] == s for r in recs) else 1)
EOF
}

run=0
# complete partial seeds first, then widen the grid seed-by-seed
for seed in 2 3 5 6 7 8 9 10 11 12; do
  for variant in baseline l2 ot; do
    [ "$run" -ge "$MAX" ] && exit 0
    if have "${variant}_pc" "$seed"; then continue; fi
    echo "=== queue: ${variant} seed ${seed} (paired-color) ==="
    python scripts/ablation_check.py --variants "$variant" --seeds "$seed" \
      --color-mode paired || exit 1
    run=$((run + 1))
  done
done
