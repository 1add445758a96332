#!/usr/bin/env bash
# Profiled short alpaca run (reference qlora/scripts/profile_llama2.sh);
# trace lands in the output dir for TensorBoard.
set -e
python run_alpaca.py --profile --max_steps=30 --group_by_length=True "$@"
