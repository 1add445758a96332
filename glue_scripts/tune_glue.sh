#!/usr/bin/env bash
# ASHA hyper-parameter search on one GLUE task (reference tune path).
set -e
TASK=${1:-cola}
shift || true
python run_glue.py "task_configs/monarch_roberta_glue/${TASK}.json" --do_tune=True "$@"
