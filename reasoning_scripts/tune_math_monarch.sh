#!/usr/bin/env bash
# HPO for Monarch on math reasoning (reference loreft/tune_math_monarch.sh:
# task tune_math = held-out slice of math_10k, 8 epochs, greedy decoding).
set -e
python run_reasoning.py -task tune_math -p f7+l7 -e 8 -lr 5e-4 \
  -batch_size 2 -gradient_accumulation_steps 16 --all_linear=True \
  --intervention_type=Nothing --dropout=0.0 --share_weights \
  --warmup_ratio=0.1 --greedy_decoding=True --do_tune=True "$@"
