#!/usr/bin/env bash
# Real-weights certification runbook: one command per reference flow that,
# given pretrained-checkpoint / dataset paths, runs the EXACT reference
# recipe (BASELINE.md best hyperparameters) and emits the metric to compare
# against the paper -- so the "within 0.5 pts of the PyTorch reference"
# north star is one command the day weights/datasets are reachable.
#
# Usage:
#   bash scripts/certify_real_weights.sh <flow> [extra --key=value args...]
#   flows: glue-cola | commonsense | math | alpaca-mmlu | all
#
# Environment:
#   MODEL=<path>   local HF checkpoint dir
#                  (roberta-large for glue-cola; Llama-2-7b-hf otherwise)
#   DATA=<path>    local dataset root (see scripts/load_datasets.sh for the
#                  layout each loader expects); data/*.py also accept HF
#                  dataset caches via HF_DATASETS_CACHE
#   SMOKE=1        plumbing check: same command paths end-to-end with tiny
#                  random models + synthetic data (no downloads); this is
#                  what the test suite exercises (tests/harness/)
#   OUT=<dir>      output root (default /tmp/certify)
#
# What to compare (paper arXiv:2408.17383 / reference README):
#   glue-cola   -> eval_matthews_correlation vs the reference's CoLA row
#                  (best HP: lr 2.1e-4, bs 16, wd 1e-3, cosine --
#                  reference results/monarch_roberta_glue/cola/best_hyperparams.json)
#   commonsense -> mean accuracy over the 8 commonsense sets; MoRe 7B beats
#                  LoRA 13B (README.md:2; best HP lr 4e-4, eff. batch 16,
#                  cosine, dropout 0.1, blk_r 4 -- official_results/commonsense)
#   math        -> mean accuracy over the 7 math sets (best HP lr 3e-4,
#                  eff. batch 64 -- official_results/math)
#   alpaca-mmlu -> mmlu_eval_accuracy (best HP lr 5.4e-4, ga 64, linear,
#                  blk_r 16 -- "results/llama_mmlu/dense rank 64")
set -eu
cd "$(dirname "$0")/.."

FLOW=${1:?usage: certify_real_weights.sh <glue-cola|commonsense|math|alpaca-mmlu|all> [args...]}
shift || true
OUT=${OUT:-/tmp/certify}
SMOKE_ARG=""
if [ "${SMOKE:-}" = "1" ]; then SMOKE_ARG="--smoke=True"; fi
mkdir -p "$OUT"

glue_cola() {
  # reference recipe: task_configs/monarch_roberta_glue/cola.json overlaid
  # with the tuned best HP (BASELINE.md "Best HP -- GLUE CoLA")
  # GLUE loads via HF datasets; point HF_DATASETS_CACHE at a local mirror
  python run_glue.py task_configs/monarch_roberta_glue/cola.json \
    ${MODEL:+--model_name_or_path="$MODEL"} \
    --learning_rate=2.1e-4 --weight_decay=1e-3 --lr_scheduler_type=cosine \
    --output_dir="$OUT/glue-cola" $SMOKE_ARG "$@"
  echo "== compare eval_matthews_correlation above vs the paper's CoLA row"
}

commonsense() {
  # reference pyreft/loreft/common_sense_monarch.sh best-HP recipe
  python run_reasoning.py -task commonsense -p f7+l7 -e 3 -lr 4e-4 \
    -batch_size 2 -gradient_accumulation_steps 8 --all_linear=True \
    --intervention_type=Nothing --dropout=0.1 --blk_r=4 --nblocks=4 \
    --schedule=cosine --weight_decay=0 \
    ${MODEL:+--model="$MODEL"} ${DATA:+--data_dir="$DATA"} \
    --output_dir="$OUT/commonsense" $SMOKE_ARG "$@"
  echo "== compare per-dataset + mean accuracy above (eval_results.json)"
}

math() {
  # reference pyreft/loreft/math_monarch.sh best-HP recipe
  python run_reasoning.py -task math -p f7+l7 -e 12 -lr 3e-4 \
    -batch_size 2 -gradient_accumulation_steps 32 --all_linear=True \
    --intervention_type=Nothing --dropout=0.1 --blk_r=4 --nblocks=4 \
    --schedule=cosine --weight_decay=0 \
    ${MODEL:+--model="$MODEL"} ${DATA:+--data_dir="$DATA"} \
    --output_dir="$OUT/math" $SMOKE_ARG "$@"
  echo "== compare per-dataset + mean accuracy above (eval_results.json)"
}

alpaca_mmlu() {
  # reference qlora/train_llama2_alpaca_7b.sh MMLU best-HP recipe
  python run_alpaca.py --dataset alpaca -lr 5.4e-4 --blk_r=16 --nblocks=4 \
    -batch_size 4 -gradient_accumulation_steps 16 --do_mmlu_eval=True \
    ${MODEL:+--model="$MODEL"} ${DATA:+--data_dir="$DATA"} \
    --output_dir="$OUT/alpaca-mmlu" $SMOKE_ARG "$@"
  echo "== compare mmlu_eval_accuracy above vs the paper's MMLU row"
}

case "$FLOW" in
  glue-cola)   glue_cola "$@" ;;
  commonsense) commonsense "$@" ;;
  math)        math "$@" ;;
  alpaca-mmlu) alpaca_mmlu "$@" ;;
  all)         glue_cola; commonsense; math; alpaca_mmlu ;;
  *) echo "unknown flow: $FLOW" >&2; exit 2 ;;
esac
