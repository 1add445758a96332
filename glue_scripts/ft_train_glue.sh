#!/usr/bin/env bash
# Full fine-tuning baseline over all GLUE tasks
# (reference glue_scripts/ft_train_glue.sh: --monarch=False, shared group).
set -e
GROUP_NAME="${1:-FT}"
[ $# -ge 1 ] && shift
for task in cola mrpc qnli rte sst2 stsb qqp mnli wnli; do
  python run_glue.py "task_configs/monarch_roberta_glue/${task}.json" \
    --group="$GROUP_NAME" --monarch=False "$@"
done
