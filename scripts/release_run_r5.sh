#!/bin/bash
# Round-5 release training run — the recipe the round-4 post-mortem
# prescribes (docs/training.md):
#
#   * --residual-skip : heads predict a zero-init correction on top of the
#     trilinear upsample, so step 0 *is* the trilinear baseline the model
#     must beat (rel-err 6.4% / fluid RMSE 0.050 m/s on the bundled frame);
#     a stable descent strictly improves on interpolation.
#   * --rel-loss-weight 1.0 : train on the published metric (smooth
#     relative speed error) with masked MSE as anchor, instead of leaving
#     the metric to chance at the walls (reference trains MSE-only but
#     reports rel-err, loss_utils.py:64-103).
#   * constant lr 1e-4 (the constant-lr cohort run beat the cosine run's
#     val by 3x in round 4) + --warmup-steps (fresh-Adam calibration; the
#     round-4 ejections all happened near init) + --restart-on-spike 10
#     (reload best + halve lr on an ejection) + EMA 0.999 + clip 1.0.
#
#   bash scripts/release_run_r5.sh [OUT_TAG]
#
# TRAIN_BUDGET (seconds, default 5400) bounds the training phase with a
# SIGTERM -> the trainer's elastic checkpoint + graceful stop; the best
# .h5 on disk is always the best-val EMA snapshot, so the post-run
# evaluation works however training ends. One TPU process at a time.
set -uo pipefail
cd "$(dirname "$0")/.."

TAG=${1:-r5}
AUG=/tmp/aug_data
EPOCHS=${EPOCHS:-60}
TRAIN_BUDGET=${TRAIN_BUDGET:-5400}
# lr 1e-3 is the reference-actual regime (legacy keras drops the lr kwarg,
# docs/training.md); the trilinear floor + best-on-val/EMA harvesting +
# restart-on-spike (which halves lr on each ejection, i.e. self-anneals)
# make the aggressive start safe. The r5 first attempt at 1e-4 showed the
# zero-init residual head needs a large lr to unblock the body: 19 epochs
# parked at the trilinear-identity plateau (loss 0.3256).
LR=${LR:-1e-3}
WARMUP=${WARMUP:-520}
RESTARTS=${RESTARTS:-4}

if [ ! -f "$AUG/train_aug.csv" ]; then
  echo "=== building augmented cohort at $AUG"
  python scripts/make_demo_cohort.py --out "$AUG" --n-realizations 6
fi

RESUME_ARGS=()
LAST_DIR=$(ls -dt demo/r5/4DFlowNet-"$TAG"_* 2>/dev/null | head -1 || true)
if [ -n "$LAST_DIR" ] && [ -d "$LAST_DIR/4DFlowNet-$TAG-latest.ckpt" ] \
   && [ ! -f "$LAST_DIR/accuracy.json" ]; then
  echo "=== resuming interrupted run $LAST_DIR"
  RESUME_ARGS=(--resume "$LAST_DIR")
fi

echo "=== training: bf16, residual-skip, rel-loss 1.0, constant 1e-4 +" \
     "warmup, restart-on-spike, EMA 0.999, $EPOCHS epochs," \
     "budget ${TRAIN_BUDGET}s"
timeout -s TERM -k 120 "$TRAIN_BUDGET" python trainer.py \
  --data-dir "$AUG" \
  --training-file "$AUG/train_aug.csv" \
  --validate-file "$AUG/val_aug.csv" \
  --benchmark-file /root/reference/data/benchmark.csv \
  --network-name "4DFlowNet-$TAG" \
  --models-dir demo/r5 \
  --patch-size 16 --res-increase 2 --batch-size 20 \
  --low-resblock 8 --hi-resblock 4 \
  --initial-learning-rate "$LR" --epochs "$EPOCHS" \
  --warmup-steps "$WARMUP" --restart-on-spike 10 --max-restarts "$RESTARTS" \
  --ema-decay 0.999 --clip-norm 1.0 \
  --rel-loss-weight 1.0 --rel-loss-eps 0.05 \
  --residual-skip --latest-every 5 \
  --bf16 "${RESUME_ARGS[@]}" 2>&1 | tee /tmp/release_train_r5.log | tail -3
echo "=== training exited (rc=$? — 124 means the budget SIGTERM fired)"

RUN_DIR=$(ls -dt demo/r5/4DFlowNet-"$TAG"_* | head -1)
echo "=== run dir: $RUN_DIR"

echo "=== evaluating best (EMA) weights"
python scripts/evaluate_model.py \
  --model-path "$RUN_DIR/4DFlowNet-$TAG-best.h5" \
  --patch-size 16 --low-resblock 8 --hi-resblock 4 \
  | tee "$RUN_DIR/accuracy.json"

echo "=== done: $RUN_DIR"
