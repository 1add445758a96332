#!/usr/bin/env bash
# Llama-2-7B instruction tuning on Alpaca with MMLU eval
# (reference qlora/train_llama2_alpaca_7b.sh; MMLU best-HP lr 5.4e-4 blk_r 16).
set -e
python run_alpaca.py --dataset alpaca -lr 5.4e-4 --blk_r=16 --nblocks=4 \
  -batch_size 4 -gradient_accumulation_steps 16 "$@"
