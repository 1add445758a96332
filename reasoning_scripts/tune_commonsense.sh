#!/usr/bin/env bash
# HPO for Monarch on commonsense reasoning (reference
# loreft/tune_commonsense.sh: task tune_commonsense, 2 epochs, greedy).
set -e
python run_reasoning.py -task tune_commonsense -p f7+l7 -e 2 -lr 5e-4 \
  -batch_size 2 -gradient_accumulation_steps 16 --all_linear=True \
  --intervention_type=Nothing --dropout=0.0 --share_weights \
  --warmup_ratio=0.1 --greedy_decoding=True --do_tune=True "$@"
