#!/usr/bin/env bash
# Llama-2-7B Monarch fine-tune on math reasoning
# (reference pyreft/loreft/math_monarch.sh: 12 epochs, bs 2 x ga 16, lr 5e-4,
#  f7+l7, all-linear, intervention Nothing).
set -e
python run_reasoning.py -task math -p f7+l7 -e 12 -lr 5e-4 \
  -batch_size 2 -gradient_accumulation_steps 16 --all_linear=True \
  --intervention_type=Nothing --dropout=0.1 "$@"
