#!/usr/bin/env bash
# Full fine-tuning HPO over all GLUE tasks (reference ft_tune_glue.sh /
# no_peft_tune_glue.sh: --monarch=False --do_tune=True, fixed grid space).
set -e
PROJECT_NAME="${1:-monarch_GLUE_no_peft}"
[ $# -ge 1 ] && shift
for task in cola mrpc qnli rte sst2 stsb qqp mnli wnli; do
  python run_glue.py "task_configs/monarch_roberta_glue/${task}.json" \
    --monarch=False --do_tune=True --project="$PROJECT_NAME" "$@"
done
