#!/usr/bin/env bash
# Instruction tuning on ultrafeedback through the loreft flow (reference
# loreft/instruct_tune_monarch.sh: layers 3;9;18;24, f5+l5, 9 epochs,
# bs 1 x ga 32, lr 5e-4, intervention Nothing + Monarch adapters).
set -e
python run_reasoning.py -task ultrafeedback -l "3;9;18;24" -rank 4 \
  -p f5+l5 -e 9 -lr 5e-4 -batch_size 1 -eval_batch_size 2 \
  -gradient_accumulation_steps 32 -max_length 768 \
  --intervention_type=Nothing --warmup_ratio=0.03 "$@"
