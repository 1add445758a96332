#!/usr/bin/env bash
# Llama-2-7B Monarch fine-tune on commonsense reasoning
# (reference pyreft/loreft/common_sense_monarch.sh: 3 epochs, lr 4e-4 best-HP).
set -e
python run_reasoning.py -task commonsense -p f7+l7 -e 3 -lr 4e-4 \
  -batch_size 2 -gradient_accumulation_steps 8 --all_linear=True \
  --intervention_type=Nothing --dropout=0.1 --blk_r=4 --nblocks=4 "$@"
