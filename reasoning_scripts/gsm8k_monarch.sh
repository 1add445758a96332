#!/usr/bin/env bash
# GSM8K fine-tune (reference pyreft/loreft gsm8k flow).
set -e
python run_reasoning.py -task gsm8k -e 12 -lr 5e-4 -batch_size 2 \
    -gradient_accumulation_steps 16 --all_linear=True "$@"
