#!/bin/bash
# Release training run: the round-3 validated recipe (docs/training.md)
# end-to-end — augmented cohort -> cosine+EMA training -> accuracy eval.
#
#   bash scripts/release_run.sh [OUT_TAG]
#
# Produces models under demo/r3/<name>_<stamp>/ and prints the
# evaluate_model.py JSON accuracy table at the end. One TPU process at a
# time (CLAUDE.md); takes ~2h through the relay at 80 epochs.
set -euo pipefail
cd "$(dirname "$0")/.."

TAG=${1:-release}
AUG=/tmp/aug_data
EPOCHS=${EPOCHS:-80}

if [ ! -f "$AUG/train_aug.csv" ]; then
  echo "=== building augmented cohort at $AUG"
  python scripts/make_demo_cohort.py --out "$AUG" --n-realizations 6
fi

# Auto-resume: if an interrupted run of this tag left a -latest.ckpt
# (the relay dropping mid-run sends SIGTERM -> elastic checkpoint),
# continue it instead of starting over.
RESUME_ARGS=()
LAST_DIR=$(ls -dt demo/r3/4DFlowNet-"$TAG"_* 2>/dev/null | head -1 || true)
if [ -n "$LAST_DIR" ] && [ -d "$LAST_DIR/4DFlowNet-$TAG-latest.ckpt" ] \
   && [ ! -f "$LAST_DIR/accuracy.json" ]; then
  echo "=== resuming interrupted run $LAST_DIR"
  RESUME_ARGS=(--resume "$LAST_DIR")
fi

echo "=== training: bf16, cosine 1e-4 -> 1e-7, EMA 0.999, $EPOCHS epochs"
python trainer.py \
  --data-dir "$AUG" \
  --training-file "$AUG/train_aug.csv" \
  --validate-file "$AUG/val_aug.csv" \
  --benchmark-file /root/reference/data/benchmark.csv \
  --network-name "4DFlowNet-$TAG" \
  --models-dir demo/r3 \
  --patch-size 16 --res-increase 2 --batch-size 20 \
  --low-resblock 8 --hi-resblock 4 \
  --initial-learning-rate 1e-4 --epochs "$EPOCHS" \
  --lr-schedule cosine --lr-final 1e-7 --ema-decay 0.999 \
  --bf16 "${RESUME_ARGS[@]}" 2>&1 | tee /tmp/release_train.log | tail -5

RUN_DIR=$(ls -dt demo/r3/4DFlowNet-"$TAG"_* | head -1)
echo "=== run dir: $RUN_DIR"

echo "=== evaluating best (EMA) weights"
python scripts/evaluate_model.py \
  --model-path "$RUN_DIR/4DFlowNet-$TAG-best.h5" \
  --patch-size 16 --low-resblock 8 --hi-resblock 4 \
  | tee "$RUN_DIR/accuracy.json"

echo "=== done: $RUN_DIR"
