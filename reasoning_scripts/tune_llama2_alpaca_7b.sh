#!/usr/bin/env bash
# HPO for Monarch on Alpaca + MMLU (reference qlora/tune_llama2_alpaca_7b.sh:
# tunes on eval_mmlu_eval_accuracy).
set -e
python run_alpaca.py --do_tune=True --do_mmlu_eval=True "$@"
