#!/usr/bin/env bash
# BOFT baseline on GLUE (reference glue_scripts/boft_train_roberta.sh).
set -e
TASK=${1:-cola}
shift || true
python run_glue.py "task_configs/boft_roberta_glue/${TASK}.json" \
    --boft=True --monarch=False "$@"
