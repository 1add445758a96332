#!/usr/bin/env bash
# Fetch the reasoning / instruction datasets into dataset/ (reference
# pyreft/loreft/load_datasets.sh clones LLM-Adapters + ultrafeedback).
# Requires network access; the harnesses fall back to learnable synthetic
# data when these files are absent.
set -e
mkdir -p dataset && cd dataset
if [ ! -d LLM-Adapters ]; then
  git clone --depth 1 https://github.com/AGI-Edgerunners/LLM-Adapters.git
fi
# LLM-Adapters layout -> the layout data/reasoning.py reads
ln -sfn LLM-Adapters/ft-training_set/math_10k.json math_10k.json
ln -sfn LLM-Adapters/ft-training_set/commonsense_170k.json commonsense_170k.json
for d in boolq piqa social_i_qa hellaswag winogrande ARC-Easy ARC-Challenge \
         openbookqa MultiArith gsm8k SVAMP mawps AddSub AQuA SingleEq; do
  ln -sfn "LLM-Adapters/dataset/$d" "$d" 2>/dev/null || true
done
echo "datasets linked under $(pwd)"
