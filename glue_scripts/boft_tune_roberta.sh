#!/usr/bin/env bash
# BOFT HPO over all GLUE tasks (reference glue_scripts/boft_tune_roberta.sh).
set -e
time_tag=$(date "+%m-%d-%H")
for task in cola mrpc mnli rte sst2 stsb qnli qqp; do
  python run_glue.py "task_configs/boft_roberta_glue/${task}.json" \
    --monarch=False --boft=True --do_tune=True \
    --project="BOFT_GLUE_tune" --notes="roberta" --time="$time_tag" "$@"
done
