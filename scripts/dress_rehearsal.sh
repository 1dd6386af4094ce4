#!/bin/bash
# Flagship dress rehearsal (VERDICT r2 #4): the full configs/105 R101
# recipe driven end-to-end through the real `main.py` CLI as ONE tracked
# artifact — 3-stage train (heads -> 4+ -> all, the reference's
# TRAIN.SCHEDULE=[6,4,3], /root/reference/lib/config.py:175 and
# script/base_8gpu.sh) at 1024² on the rich synthetic set, live dashboard
# served, a mid-stage SIGKILL + crash-resume, multi-scale fp32 eval, and
# the t-SNE visualize phase. Logs + metrics + eval results land under
# results/rehearsal/ (checkpoints and image data stay untracked).
#
# Run on the chip (takes ~1-1.5 h, compile-dominated at the start):
#   bash scripts/dress_rehearsal.sh
set -uo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
OUT=results/rehearsal
DATA=$OUT/data
# the run folder name comes from the yaml file (reference behavior:
# CONFIG_NAME is derived from --config_file); --config_name is ignored
NAME=meta_105_quick_1
mkdir -p "$OUT"

echo "== [1/6] rich synthetic dataset at 768x1024 =="
# 300 train images: at 1024² the 1-core host's loader paces training at
# ~3.5 s/step (batch 4), so the reference's full [6,4,3] schedule over 600
# images would outlast the chip budget; 300 keeps every recipe stage at
# full resolution within ~1 h
python - <<PY
from feature_intertwiner_tpu.data import synthetic
synthetic.generate_rich("$DATA", num_images=300, split="train", seed=0,
                        size=(768, 1024))
synthetic.generate_rich("$DATA", num_images=100, split="minival", seed=7777,
                        size=(768, 1024))
print("dataset ready")
PY

TRAIN_CMD=(python main.py --phase train
  --config_file configs/105/meta_105_quick_1.yaml
  --data_root "$DATA"
  TRAIN.SCHEDULE [6,4,3] TRAIN.BN_LEARN True
  TRAIN.KEEP_CHECKPOINTS 3
  TPU.REMAT_BACKBONE True
  MISC.USE_VISDOM True MISC.VIS.PORT 8097)

echo "== [2/6] 3-stage train, SIGKILLed mid-stage-1 (crash-resume probe) =="
# 1024² R101 compiles take several minutes; 900 s lands the kill well into
# stage-1 training, after multiple within-epoch checkpoints exist
timeout -s KILL 900 "${TRAIN_CMD[@]}" > "$OUT/train_killed.log" 2>&1
echo "(exit $? — expected 137 from the SIGKILL)"
tail -3 "$OUT/train_killed.log"

echo "== [3/6] resume from last checkpoint, train to completion =="
"${TRAIN_CMD[@]}" > "$OUT/train_resumed.log" 2>&1
tail -5 "$OUT/train_resumed.log"

echo "== [4/6] single-scale eval (bf16) =="
python main.py --phase inference \
  --config_file configs/105/meta_105_quick_1.yaml \
  --data_root "$DATA" \
  > "$OUT/eval_single.log" 2>&1
grep -A13 "Average Precision\|IoU metric\|AP @" "$OUT/eval_single.log" | head -16

echo "== [5/6] multi-scale fp32 eval (cache key carries the _ms tag) =="
python main.py --phase inference \
  --config_file configs/105/meta_105_quick_1.yaml \
  --data_root "$DATA" \
  TEST.MULTI_SCALE [800,1024,1280] TEST.DTYPE float32 \
  > "$OUT/eval_multiscale.log" 2>&1
tail -20 "$OUT/eval_multiscale.log"

echo "== [6/6] visualize phase + t-SNE =="
python main.py --phase visualize \
  --config_file configs/105/meta_105_quick_1.yaml \
  --data_root "$DATA" \
  > "$OUT/visualize.log" 2>&1
python scripts/tsne_features.py "results/$NAME/visualize/features.npz" \
  --out "$OUT/tsne.png" >> "$OUT/visualize.log" 2>&1
tail -3 "$OUT/visualize.log"

echo "== collecting tracked artifacts =="
cp -f "results/$NAME/train/log.txt" "$OUT/train_log.txt" 2>/dev/null || true
cp -f "results/$NAME/train/metrics.jsonl" "$OUT/metrics.jsonl" 2>/dev/null || true
cp -f "results/$NAME/train/dashboard.html" "$OUT/dashboard.html" 2>/dev/null || true
cp -f results/$NAME/inference/det_result_*.json "$OUT/" 2>/dev/null || true
ls -la "$OUT"
echo "rehearsal complete"
