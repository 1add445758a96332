#!/usr/bin/env bash
# Predict-only pass over all GLUE tasks from saved checkpoints
# (reference glue_scripts/test_glue.sh: --do_train=False --wandb=False
#  --resume_from_checkpoint=True; TSVs land under each task's predict/).
set -e
for task in cola mrpc qnli rte sst2 stsb qqp mnli wnli; do
  python run_glue.py "task_configs/monarch_roberta_glue/${task}.json" \
    --do_train=False --wandb=False --resume=True --do_predict=True "$@"
done
