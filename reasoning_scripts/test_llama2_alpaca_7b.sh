#!/usr/bin/env bash
# Eval/predict-only Alpaca + MMLU pass from saved checkpoints, scored on
# the MMLU TEST split (reference qlora/test_llama2_alpaca_7b.sh passes
# --mmlu_split test).
set -e
python run_alpaca.py --epochs=0 --do_eval=True --do_mmlu_eval=True \
  --mmlu_split=test --resume=True "$@"
