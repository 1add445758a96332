#!/usr/bin/env bash
# Eval/predict-only Alpaca + MMLU pass from saved checkpoints
# (reference qlora/test_llama2_alpaca_7b.sh).
set -e
python run_alpaca.py --epochs=0 --do_eval=True --do_mmlu_eval=True \
  --resume=True "$@"
